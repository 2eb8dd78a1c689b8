"""Tests for the eval/analysis utilities: PRD, embeddings, clustering."""
import numpy as np
import pytest

from posterior_matching_tpu.eval import (
    clustering_accuracy,
    compute_prd,
    compute_prd_from_embedding,
    get_inception_embeddings,
    prd_to_max_f_beta_pair,
)


def test_prd_identical_distributions():
    d = np.ones(10) / 10
    precision, recall = compute_prd(d, d)
    # identical dists -> the curve passes through (1, 1)
    assert precision.max() > 0.99
    assert recall.max() > 0.99


def test_prd_disjoint_distributions():
    p = np.zeros(10)
    p[:5] = 0.2
    q = np.zeros(10)
    q[5:] = 0.2
    precision, recall = compute_prd(p, q)
    assert precision.max() < 1e-6
    assert recall.max() < 1e-6


def test_prd_curve_monotone_tradeoff():
    rng = np.random.RandomState(0)
    p = rng.dirichlet(np.ones(20))
    q = rng.dirichlet(np.ones(20))
    precision, recall = compute_prd(q, p)
    # as the angle grows, precision grows and recall falls (monotone sweep)
    assert (np.diff(precision) >= -1e-9).all()
    assert (np.diff(recall) <= 1e-9).all()


def test_prd_from_embedding_same_data_high_f_scores():
    rng = np.random.RandomState(0)
    data = rng.randn(200, 8)
    precision, recall = compute_prd_from_embedding(
        data, data.copy(), num_clusters=5, num_runs=2
    )
    f8, f1_8 = prd_to_max_f_beta_pair(precision, recall)
    assert f8 > 0.95 and f1_8 > 0.95


def test_prd_balance_enforced():
    with pytest.raises(ValueError, match="sizes differ"):
        compute_prd_from_embedding(np.zeros((5, 2)), np.zeros((6, 2)))


def test_embeddings_shapes_and_determinism():
    rng = np.random.RandomState(0)
    imgs = rng.rand(6, 32, 32, 1).astype(np.float32)
    e1 = get_inception_embeddings(imgs, batch_size=4, verbose=False)
    e2 = get_inception_embeddings(imgs, batch_size=3, verbose=False)
    assert e1.shape == (6, 2048)
    np.testing.assert_allclose(e1, e2, atol=1e-4)


def test_embeddings_separate_distinct_images():
    rng = np.random.RandomState(0)
    a = np.zeros((4, 32, 32, 3), np.float32)
    b = np.ones((4, 32, 32, 3), np.float32)
    ea = get_inception_embeddings(a, verbose=False)
    eb = get_inception_embeddings(b, verbose=False)
    assert np.abs(ea - eb).max() > 1e-3


def test_clustering_accuracy_permutation_invariant():
    y_true = np.array([0, 0, 1, 1, 2, 2])
    y_pred = np.array([2, 2, 0, 0, 1, 1])  # perfect up to relabeling
    assert clustering_accuracy(y_true, y_pred) == 1.0


def test_clustering_accuracy_partial():
    y_true = np.array([0, 0, 1, 1])
    y_pred = np.array([0, 1, 1, 1])
    assert clustering_accuracy(y_true, y_pred) == 0.75


def test_batch_process_concatenates():
    import jax.numpy as jnp

    from posterior_matching_tpu.data.datasets import ArrayDataset
    from posterior_matching_tpu.utils import batch_process

    x = np.arange(40, dtype=np.float32).reshape(20, 2)
    ds = ArrayDataset({"features": x}, batch_size=8, drop_remainder=False)
    out = batch_process(lambda b: {"y": b["features"] * 2}, ds)
    np.testing.assert_allclose(out["y"], x * 2)


def test_nrmse_score_matches_reference_formula_when_all_features_vary():
    from eval_pm_vae_uci import nrmse_score

    rng = np.random.RandomState(0)
    T, N, D = 3, 40, 7
    true = rng.randn(N, D)
    x = np.broadcast_to(true[None], (T, N, D))
    imput = x + 0.1 * rng.randn(T, N, D)
    mask = (rng.rand(T, N, D) > 0.5).astype(np.float32)
    got = nrmse_score(imput, x, mask)
    # the reference formula (reference eval_pm_vae_uci.py:60-66), per trial
    for t in range(T):
        err = (imput[t] - x[t]) ** 2
        mse = np.sum(err, axis=-2) / np.count_nonzero(1.0 - mask[t], axis=-2)
        want = np.mean(np.sqrt(mse) / np.std(x[t], axis=-2))
        np.testing.assert_allclose(got[t], want, rtol=1e-12)


def test_nrmse_score_excludes_zero_variance_features():
    from eval_pm_vae_uci import nrmse_score

    rng = np.random.RandomState(1)
    T, N, D = 2, 30, 6
    true = rng.randn(N, D)
    true[:, 2] = 0.0  # an always-blank feature (real digits corner pixels)
    x = np.broadcast_to(true[None], (T, N, D)).copy()
    imput = x + 0.1 * rng.randn(T, N, D)
    mask = (rng.rand(T, N, D) > 0.5).astype(np.float32)
    got = nrmse_score(imput, x, mask)
    assert got.shape == (T,)
    assert np.all(np.isfinite(got))
    # equals the plain formula restricted to the varying features
    keep = [0, 1, 3, 4, 5]
    for t in range(T):
        err = (imput[t] - x[t]) ** 2
        mse = np.sum(err, axis=-2) / np.count_nonzero(1.0 - mask[t], axis=-2)
        per_feat = np.sqrt(mse) / np.std(x[t], axis=-2)
        np.testing.assert_allclose(got[t], np.mean(per_feat[keep]), rtol=1e-12)
