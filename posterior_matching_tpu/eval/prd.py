"""Precision/Recall for Distributions (PRD) — arXiv 1806.00035.

Fresh numpy implementation of the published algorithm (the reference vendors
google/compare_gan's, reference ``posterior_matching/prd/prd_score.py``):
cluster the union of real and generated embeddings into bins with minibatch
k-means, then sweep the likelihood-ratio threshold over angles in (0, pi/2) to
trace the precision/recall curve; summarize with max-F_beta pairs.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import sklearn.cluster


def compute_prd(
    eval_dist: np.ndarray,
    ref_dist: np.ndarray,
    num_angles: int = 1001,
    epsilon: float = 1e-10,
) -> Tuple[np.ndarray, np.ndarray]:
    """PRD curve for two discrete distributions over the same states.

    precision(theta) = sum_i min(tan(theta) * ref_i, eval_i)
    recall(theta)    = precision(theta) / tan(theta)
    """
    if not 0 < epsilon <= 0.1:
        raise ValueError(f"epsilon must be in (0, 0.1], got {epsilon}")
    if not 3 <= num_angles <= 1e6:
        raise ValueError(f"num_angles must be in [3, 1e6], got {num_angles}")

    angles = np.linspace(epsilon, np.pi / 2 - epsilon, num=num_angles)
    slopes = np.tan(angles)[:, None]
    precision = np.minimum(ref_dist[None] * slopes, eval_dist[None]).sum(axis=1)
    recall = precision / slopes[:, 0]

    # numerical slack: values may land just above 1 when P == Q
    if max(precision.max(), recall.max()) > 1.001:
        raise ValueError("PRD value > 1.001; distributions are invalid")
    return np.clip(precision, 0, 1), np.clip(recall, 0, 1)


def _bin_by_clusters(eval_data, ref_data, num_clusters):
    joint = np.vstack([eval_data, ref_data])
    km = sklearn.cluster.MiniBatchKMeans(n_clusters=num_clusters, n_init=10)
    labels = km.fit(joint).labels_
    e = np.histogram(
        labels[: len(eval_data)], bins=num_clusters,
        range=[0, num_clusters], density=True,
    )[0]
    r = np.histogram(
        labels[len(eval_data) :], bins=num_clusters,
        range=[0, num_clusters], density=True,
    )[0]
    return e, r


def compute_prd_from_embedding(
    eval_data: np.ndarray,
    ref_data: np.ndarray,
    num_clusters: int = 20,
    num_angles: int = 1001,
    num_runs: int = 10,
    enforce_balance: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """PRD from embedding samples: cluster-bin the union, average the curve
    over ``num_runs`` independent clusterings."""
    if enforce_balance and len(eval_data) != len(ref_data):
        raise ValueError(
            f"eval ({len(eval_data)}) and ref ({len(ref_data)}) sizes differ; "
            f"set enforce_balance=False to override (not recommended)"
        )
    eval_data = np.asarray(eval_data, np.float64)
    ref_data = np.asarray(ref_data, np.float64)
    total = len(eval_data) + len(ref_data)
    if total < num_clusters:
        # tiny smoke runs: k-means needs n_samples >= n_clusters; clamping
        # only changes behavior below protocol scale (20 clusters needs >= 20
        # embeddings, reference prd_score.py:138 would raise here too)
        import warnings

        warnings.warn(
            f"clamping PRD num_clusters {num_clusters} -> {total} "
            f"(only {total} embeddings)"
        )
        num_clusters = total
    precisions, recalls = [], []
    for _ in range(num_runs):
        e, r = _bin_by_clusters(eval_data, ref_data, num_clusters)
        p, rec = compute_prd(e, r, num_angles)
        precisions.append(p)
        recalls.append(rec)
    return np.mean(precisions, axis=0), np.mean(recalls, axis=0)


def _f_beta(precision, recall, beta, epsilon=1e-10):
    if not ((precision >= 0).all() and (precision <= 1).all()):
        raise ValueError("precision values must be in [0, 1]")
    if not ((recall >= 0).all() and (recall <= 1).all()):
        raise ValueError("recall values must be in [0, 1]")
    if beta <= 0:
        raise ValueError(f"beta must be positive, got {beta}")
    b2 = beta**2
    return (1 + b2) * precision * recall / (b2 * precision + recall + epsilon)


def prd_to_max_f_beta_pair(
    precision: np.ndarray, recall: np.ndarray, beta: float = 8
) -> Tuple[float, float]:
    """(max F_beta, max F_{1/beta}): scalar summaries correlating with recall
    and precision respectively."""
    precision = np.asarray(precision)
    recall = np.asarray(recall)
    return (
        float(np.max(_f_beta(precision, recall, beta))),
        float(np.max(_f_beta(precision, recall, 1.0 / beta))),
    )
