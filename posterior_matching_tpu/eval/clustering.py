"""Clustering-accuracy metric + trainer callback (reference
``posterior_matching/clustering.py``)."""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import numpy as np
from scipy.optimize import linear_sum_assignment
from sklearn.metrics import confusion_matrix

from posterior_matching_tpu.train.callbacks import Callback


def clustering_accuracy(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Best-assignment accuracy: solve the cluster->label matching as a linear
    sum assignment over the confusion matrix (reference clustering.py:18-37).
    """
    cm = confusion_matrix(y_true, y_pred)
    cost = np.max(cm) - cm
    rows, cols = linear_sum_assignment(cost)
    return float(cm[rows, cols].sum()) / float(np.sum(cm))


class ClusteringAccuracyCallback(Callback):
    """Accumulates cluster predictions over the validation epoch and logs
    ``val_clustering_accuracy`` (reference clustering.py:40-72).

    Args:
        pred_fn: ``(params, state, key, batch) -> cluster ids``; jitted here.
    """

    def __init__(self, pred_fn: Callable[..., Any]):
        self._pred_fn = jax.jit(pred_fn)
        self._preds = []
        self._labels = []

    def on_validation_step(self, train_state, key, batch):
        preds = self._pred_fn(
            train_state.params, train_state.state, key, batch
        )
        self._labels.append(np.asarray(batch["label"]))
        self._preds.append(np.asarray(preds))

    def on_validation_end(self, train_state, step, logs: Dict[str, Any]):
        if not self._labels:
            return
        y_true = np.hstack(self._labels)
        y_pred = np.hstack(self._preds)
        logs["val_clustering_accuracy"] = clustering_accuracy(y_true, y_pred)
        self._labels.clear()
        self._preds.clear()
