"""Golden-value tests for the distribution library (vs scipy formulas)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from posterior_matching_tpu import distributions as pmd


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_normal_log_prob_matches_scipy(rng):
    loc = rng.randn(4, 3).astype(np.float32)
    scale = rng.rand(4, 3).astype(np.float32) + 0.5
    x = rng.randn(4, 3).astype(np.float32)
    got = pmd.Normal(jnp.asarray(loc), jnp.asarray(scale)).log_prob(x)
    want = scipy.stats.norm(loc, scale).logpdf(x)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_normal_kl_zero_for_same():
    d = pmd.Normal(jnp.ones((3,)), jnp.full((3,), 2.0))
    np.testing.assert_allclose(d.kl_divergence(d), 0.0, atol=1e-6)


def test_mvn_diag_log_prob_matches_scipy(rng):
    loc = rng.randn(5).astype(np.float64)
    scale = rng.rand(5) + 0.5
    x = rng.randn(2, 5)
    d = pmd.MultivariateNormalDiag(jnp.asarray(loc), jnp.asarray(scale))
    want = scipy.stats.multivariate_normal(loc, np.diag(scale**2)).logpdf(x)
    np.testing.assert_allclose(d.log_prob(x), want, rtol=1e-4)


def test_mvn_tril_log_prob_matches_scipy(rng):
    k = 4
    a = rng.randn(k, k)
    cov = a @ a.T + np.eye(k)
    tril = np.linalg.cholesky(cov)
    loc = rng.randn(k)
    x = rng.randn(3, k)
    d = pmd.MultivariateNormalTriL(jnp.asarray(loc), jnp.asarray(tril))
    want = scipy.stats.multivariate_normal(loc, cov).logpdf(x)
    np.testing.assert_allclose(d.log_prob(x), want, rtol=1e-4)


def test_mvn_tril_entropy_matches_scipy(rng):
    k = 3
    a = rng.randn(k, k)
    cov = a @ a.T + np.eye(k)
    d = pmd.MultivariateNormalTriL(
        jnp.zeros(k), jnp.asarray(np.linalg.cholesky(cov))
    )
    want = scipy.stats.multivariate_normal(np.zeros(k), cov).entropy()
    np.testing.assert_allclose(d.entropy(), want, rtol=1e-5)


def _mc_kl(p_sampler, p_logp, q_logp, key, n=200_000, atol=0.02):
    z = p_sampler(key, (n,))
    return jnp.mean(p_logp(z) - q_logp(z))


def test_kl_diag_diag_closed_form(rng):
    k = 3
    p = pmd.MultivariateNormalDiag(
        jnp.asarray(rng.randn(k)), jnp.asarray(rng.rand(k) + 0.5)
    )
    q = pmd.MultivariateNormalDiag(
        jnp.asarray(rng.randn(k)), jnp.asarray(rng.rand(k) + 0.5)
    )
    got = p.kl_divergence(q)
    mc = _mc_kl(p.sample, p.log_prob, q.log_prob, jax.random.PRNGKey(0))
    np.testing.assert_allclose(got, mc, rtol=0.05, atol=0.01)


def test_kl_diag_tril_closed_form(rng):
    k = 3
    p = pmd.MultivariateNormalDiag(
        jnp.asarray(rng.randn(k)), jnp.asarray(rng.rand(k) + 0.5)
    )
    a = rng.randn(k, k) * 0.3
    cov = a @ a.T + np.eye(k)
    q = pmd.MultivariateNormalTriL(
        jnp.asarray(rng.randn(k)), jnp.asarray(np.linalg.cholesky(cov))
    )
    got = p.kl_divergence(q)
    mc = _mc_kl(p.sample, p.log_prob, q.log_prob, jax.random.PRNGKey(1))
    np.testing.assert_allclose(got, mc, rtol=0.05, atol=0.02)


def test_kl_diag_tril_fused_values_and_gradients(rng):
    """The fully-fused custom-VJP KL (one stacked [D|d] solve + hand adjoint,
    _math.kl_diag_tril) must match a composite autodiff implementation in
    value AND all four gradients to 1e-5, at VDVAE-like batched shapes and
    on the large-k XLA fallback path."""
    from posterior_matching_tpu.distributions._math import kl_diag_tril

    def composite(loc_p, sp, loc_q, tril):
        rhs = jnp.eye(tril.shape[-1]) * sp[..., None, :]
        n = jax.scipy.linalg.solve_triangular(tril, rhs, lower=True)
        z = jax.scipy.linalg.solve_triangular(
            tril, (loc_q - loc_p)[..., None], lower=True
        )[..., 0]
        k = tril.shape[-1]
        return (
            0.5 * (jnp.sum(n * n, (-2, -1)) + jnp.sum(z * z, -1) - k)
            + jnp.sum(jnp.log(jnp.diagonal(tril, axis1=-2, axis2=-1)), -1)
            - jnp.sum(jnp.log(sp), -1)
        )

    for batch, k in [((4, 7), 16), ((3,), 5), ((2,), 40)]:
        loc_p = jnp.asarray(rng.randn(*batch, k), jnp.float32)
        sp = jnp.asarray(rng.rand(*batch, k) + 0.5, jnp.float32)
        loc_q = jnp.asarray(rng.randn(*batch, k), jnp.float32)
        a = rng.randn(*batch, k, k) * (0.3 / np.sqrt(k))
        cov = a @ np.swapaxes(a, -1, -2) + np.eye(k)
        tril = jnp.asarray(np.linalg.cholesky(cov), jnp.float32)

        got = kl_diag_tril(loc_p, sp, loc_q, tril)
        want = composite(loc_p, sp, loc_q, tril)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

        w = jnp.asarray(rng.randn(*batch), jnp.float32)  # random cotangent

        def scalar(fn):
            return lambda *args: jnp.sum(fn(*args) * w)

        g_got = jax.grad(scalar(kl_diag_tril), argnums=(0, 1, 2, 3))(
            loc_p, sp, loc_q, tril
        )
        g_want = jax.grad(scalar(composite), argnums=(0, 1, 2, 3))(
            loc_p, sp, loc_q, tril
        )
        for a_, b_ in zip(g_got, g_want):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=1e-5,
                err_msg=f"batch={batch} k={k}",
            )


def test_kl_tril_diag_closed_form(rng):
    k = 3
    a = rng.randn(k, k) * 0.3
    cov = a @ a.T + np.eye(k)
    p = pmd.MultivariateNormalTriL(
        jnp.asarray(rng.randn(k)), jnp.asarray(np.linalg.cholesky(cov))
    )
    q = pmd.MultivariateNormalDiag(
        jnp.asarray(rng.randn(k)), jnp.asarray(rng.rand(k) + 0.5)
    )
    got = p.kl_divergence(q)
    mc = _mc_kl(p.sample, p.log_prob, q.log_prob, jax.random.PRNGKey(2))
    np.testing.assert_allclose(got, mc, rtol=0.05, atol=0.02)


def test_mvn_sampling_moments():
    k = 3
    tril = jnp.asarray([[1.0, 0, 0], [0.5, 0.8, 0], [-0.3, 0.2, 0.6]])
    loc = jnp.asarray([1.0, -1.0, 0.5])
    d = pmd.MultivariateNormalTriL(loc, tril)
    z = d.sample(jax.random.PRNGKey(3), (100_000,))
    np.testing.assert_allclose(jnp.mean(z, 0), loc, atol=0.02)
    cov = np.cov(np.asarray(z).T)
    np.testing.assert_allclose(cov, tril @ tril.T, atol=0.03)


def test_fill_scale_tril_positive_diag(rng):
    k = 5
    v = jnp.asarray(rng.randn(2, pmd.tril_size(k)).astype(np.float32) * 3)
    tril = pmd.fill_scale_tril(v, k)
    diag = np.diagonal(np.asarray(tril), axis1=-2, axis2=-1)
    assert (diag > 0).all()
    # strictly upper entries are zero
    upper = np.triu(np.asarray(tril), k=1)
    np.testing.assert_allclose(upper, 0.0)


def test_bernoulli_log_prob(rng):
    logits = rng.randn(4, 5).astype(np.float32)
    x = (rng.rand(4, 5) > 0.5).astype(np.float32)
    d = pmd.Bernoulli(jnp.asarray(logits))
    p = 1 / (1 + np.exp(-logits))
    want = x * np.log(p) + (1 - x) * np.log(1 - p)
    np.testing.assert_allclose(d.log_prob(x), want, rtol=1e-4)


def test_categorical(rng):
    logits = jnp.asarray(rng.randn(3, 7).astype(np.float32))
    d = pmd.Categorical(logits)
    x = jnp.asarray([0, 3, 6])
    want = np.asarray(jax.nn.log_softmax(logits))[np.arange(3), [0, 3, 6]]
    np.testing.assert_allclose(d.log_prob(x), want, rtol=1e-5)
    s = d.sample(jax.random.PRNGKey(0), (1000,))
    assert s.shape == (1000, 3)
    assert (np.asarray(s) >= 0).all() and (np.asarray(s) < 7).all()


def test_gmm1d_log_prob_vs_mixture_formula(rng):
    b, d, k = 2, 3, 4
    logits = rng.randn(b, d, k)
    means = rng.randn(b, d, k)
    scales = rng.rand(b, d, k) + 0.3
    x = rng.randn(b, d)
    dist = pmd.GMM1D(
        jnp.asarray(logits), jnp.asarray(means), jnp.asarray(scales)
    )
    w = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    comp = scipy.stats.norm(means, scales).pdf(x[..., None])
    want = np.log((w * comp).sum(-1))
    np.testing.assert_allclose(dist.log_prob(x), want, rtol=1e-4)


def test_gmm1d_sample_moments():
    logits = jnp.zeros((1, 2))
    means = jnp.asarray([[-2.0, 2.0]])
    scales = jnp.asarray([[0.1, 0.1]])
    d = pmd.GMM1D(logits, means, scales)
    s = d.sample(jax.random.PRNGKey(0), (50_000,))
    assert s.shape == (50_000, 1)
    np.testing.assert_allclose(np.mean(np.asarray(s)), 0.0, atol=0.05)
    np.testing.assert_allclose(np.std(np.asarray(s)), 2.0, atol=0.05)


def test_quantized_logistic_mixture_is_normalized():
    """Sum over all 256 pixel values must be ~1 per pixel."""
    key = jax.random.PRNGKey(0)
    m, c = 3, 1
    logits = jax.random.normal(key, (1, 2, 2, m))
    locs = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 2, m, c)) * 0.5
    scales = jax.nn.softplus(
        jax.random.normal(jax.random.fold_in(key, 2), (1, 2, 2, m, c))
    ) + 0.05
    dist = pmd.QuantizedLogisticMixture(
        logits, locs, scales, None, low=0.0, high=255.0, num_channels=c
    )
    values = jnp.arange(256.0)
    lps = [
        dist.log_prob(jnp.full((1, 2, 2, c), v), independent=False)
        for v in values
    ]
    total = np.exp(np.stack([np.asarray(lp) for lp in lps])).sum(0)
    np.testing.assert_allclose(total, 1.0, atol=1e-3)


def test_quantized_logistic_mixture_rgb_coupling_shapes():
    b, h, w, m, c = 2, 4, 4, 5, 3
    key = jax.random.PRNGKey(1)
    dist = pmd.QuantizedLogisticMixture(
        jax.random.normal(key, (b, h, w, m)),
        jax.random.normal(key, (b, h, w, m, c)),
        jnp.ones((b, h, w, m, c)) * 0.1,
        jax.random.normal(key, (b, h, w, m, c * (c - 1) // 2)),
        low=0.0,
        high=255.0,
        num_channels=c,
    )
    x = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (b, h, w, c)), jnp.float32
    )
    lp = dist.log_prob(x)
    assert lp.shape == (b,)
    assert np.isfinite(np.asarray(lp)).all()
    mean = dist.mean()
    assert mean.shape == (b, h, w, c)
    assert (np.asarray(mean) >= 0).all() and (np.asarray(mean) <= 255).all()
    s = dist.sample(jax.random.PRNGKey(2))
    assert s.shape == (b, h, w, c)


def test_tril_matsolve_matches_xla():
    """The unrolled small-k solve must agree with XLA's TriangularSolve in
    values AND gradients (the backward is a hand-written adjoint)."""
    from posterior_matching_tpu.distributions._math import tril_matsolve

    rng = np.random.RandomState(0)
    k, r = 7, 3
    L = np.tril(rng.rand(4, 5, k, k).astype(np.float32)) + 2 * np.eye(
        k, dtype=np.float32
    )
    B = rng.rand(4, 5, k, r).astype(np.float32)

    got = tril_matsolve(jnp.asarray(L), jnp.asarray(B))
    want = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def loss_ours(L, B):
        return jnp.sum(jnp.sin(tril_matsolve(L, B)))

    def loss_xla(L, B):
        return jnp.sum(
            jnp.sin(jax.scipy.linalg.solve_triangular(L, B, lower=True))
        )

    gl, gb = jax.grad(loss_ours, argnums=(0, 1))(
        jnp.asarray(L), jnp.asarray(B)
    )
    wl, wb = jax.grad(loss_xla, argnums=(0, 1))(
        jnp.asarray(L), jnp.asarray(B)
    )
    np.testing.assert_allclose(gb, wb, rtol=1e-4, atol=1e-5)
    # XLA's solve may report nonzero cotangents on the (unused) upper
    # triangle depending on lowering; compare the lower triangles.
    np.testing.assert_allclose(
        np.tril(np.asarray(gl)), np.tril(np.asarray(wl)), rtol=1e-4,
        atol=1e-5,
    )


def test_kl_diag_tril_matches_mc():
    """KL(diag || TriL) via the unrolled trace term against a Monte-Carlo
    estimate."""
    from posterior_matching_tpu.distributions import (
        MultivariateNormalDiag,
        MultivariateNormalTriL,
    )
    from posterior_matching_tpu.distributions._math import fill_scale_tril

    rng = np.random.RandomState(1)
    k = 4
    p = MultivariateNormalDiag(
        loc=jnp.asarray(rng.randn(2, k).astype(np.float32)),
        scale_diag=jnp.asarray(
            0.5 + rng.rand(2, k).astype(np.float32)
        ),
    )
    q = MultivariateNormalTriL(
        loc=jnp.asarray(rng.randn(2, k).astype(np.float32)),
        scale_tril=fill_scale_tril(
            jnp.asarray(rng.randn(2, k * (k + 1) // 2).astype(np.float32)),
            k,
        ),
    )
    analytic = p.kl_divergence(q)
    z = p.sample(jax.random.PRNGKey(0), (200000,))
    mc = jnp.mean(p.log_prob(z) - q.log_prob(z), axis=0)
    np.testing.assert_allclose(analytic, mc, rtol=0.05, atol=0.05)


def test_tril_matsolve_large_k_fallback():
    """k > 32 routes to XLA's solve (values and the custom-VJP backward must
    still agree with autodiff through the XLA path)."""
    from posterior_matching_tpu.distributions._math import (
        _UNROLL_MAX_DIM,
        tril_matsolve,
    )

    k = _UNROLL_MAX_DIM + 8
    rng = np.random.RandomState(2)
    L = np.tril(rng.rand(3, k, k).astype(np.float32)) + 2 * np.eye(
        k, dtype=np.float32
    )
    B = rng.rand(3, k, 2).astype(np.float32)
    got = tril_matsolve(jnp.asarray(L), jnp.asarray(B))
    want = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    g1 = jax.grad(lambda L: jnp.sum(tril_matsolve(L, jnp.asarray(B)) ** 2))(
        jnp.asarray(L)
    )
    g2 = jax.grad(
        lambda L: jnp.sum(
            jax.scipy.linalg.solve_triangular(L, B, lower=True) ** 2
        )
    )(jnp.asarray(L))
    np.testing.assert_allclose(
        np.tril(np.asarray(g1)), np.tril(np.asarray(g2)), rtol=1e-4,
        atol=1e-4,
    )
