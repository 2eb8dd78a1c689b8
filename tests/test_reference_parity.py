"""Reference-parity harness.

Runs ACTUAL reference code from /root/reference on CPU — the mask generators
directly (they need only numpy/PIL/tf, all installed), and the model modules
over the textbook shims in ``tests/refshims`` (see its README) — and asserts
numeric agreement with this framework. This closes BASELINE.md's
"bit-comparable on CPU" correctness gate for:

- masked-conv layer semantics (reference pixel_cnn.py:148-211 + the
  _make_kernel_constraint mask specs, :556-562) — EXACT agreement with our
  sliced-kernel/masked convs given identical weights;
- DMoL log-probs and means (reference vdvae.py:331-433) — reference channel
  coupling + quantization vs our fused closed form, same raw parameters;
- VDVAE block-string helpers (reference vdvae.py:213-240);
- KL(diag || TriL) (the pm_kl formula, reference vdvae.py:546-569) — our
  unrolled-substitution path vs an independent jax.scipy implementation;
- mask-generator DISTRIBUTIONS (reference masking.py:50-335) — the actual
  host generators vs our on-device pure functions, summary-statistic match.

Stochastic semantics differ by construction (different PRNG streams), so
generator parity is distributional: large fixed-seed samples, generous
tolerances (chosen ≥5 sigma of the estimator noise to be non-flaky).
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE_ROOT = "/root/reference"
SHIM_ROOT = os.path.join(os.path.dirname(__file__), "refshims")


def _import_reference(module: str):
    """Imports a reference module with the shim packages available.

    Paths are APPENDED so real installations (none in this image) would win.
    The reference tree is read-only and treated as untrusted data: we import
    and execute known model/masking code for numeric comparison only.
    """
    for p in (SHIM_ROOT, REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.append(p)
    import importlib

    return importlib.import_module(module)


# ---------------------------------------------------------------------------
# Masked convolutions (reference pixel_cnn.py:148-211)
# ---------------------------------------------------------------------------

# (kernel_size, valid_rows, valid_cols, strides) — every mask spec the
# reference _PixelCNNNetwork builds (pixel_cnn.py:391-420, 465-476, 526-545)
# at receptive_field_dims (rows=5, cols=3) plus the init convs.
_CONV_SPECS = [
    ((9, 3), (0, 4), (0, 3), (1, 1)),   # v_init: (2r-1, c), rows [0, r-1)
    ((3, 3), (0, 1), (0, 3), (1, 1)),   # h_init_up
    ((3, 3), (0, 2), (0, 1), (1, 1)),   # h_init_left: cols [0, c//2)
    ((7, 3), (0, 4), (0, 3), (1, 1)),   # vertical stack (2r-3, c)
    ((3, 3), (0, 2), (0, 2), (1, 1)),   # horizontal stack (3, c), (2, c//2+1)
    ((8, 4), (0, 4), (0, 3), (2, 2)),   # down_sample vertical (2h, w+1)
    ((4, 6), (0, 2), (0, 3), (2, 2)),   # down_sample horizontal (2h, 2w)
]


@pytest.mark.parametrize("spec", _CONV_SPECS, ids=[str(s) for s in _CONV_SPECS])
def test_masked_conv_matches_reference(spec):
    import haiku as hk

    ref_pcnn = _import_reference("posterior_matching.models.pixel_cnn")
    from posterior_matching_tpu.models.pixelcnn import _MaskedConv

    kernel_size, vrows, vcols, strides = spec
    features = 8
    x = np.random.RandomState(0).randn(2, 12, 12, 5).astype(np.float32)

    mask = ref_pcnn._make_kernel_constraint(kernel_size, vrows, vcols)

    def ref_fwd(inp):
        return ref_pcnn._Conv2D(
            output_channels=features,
            kernel_shape=kernel_size,
            stride=strides,
            padding="SAME",
            mask=mask,
        )(inp)

    ref_model = hk.transform(ref_fwd)
    ref_params = ref_model.init(jax.random.PRNGKey(0), x)
    ref_out = ref_model.apply(ref_params, None, x)

    ((_, wb),) = ref_params.items()
    kernel, bias = np.asarray(wb["w"]), np.asarray(wb["b"])

    ours = _MaskedConv(features, kernel_size, vrows, vcols, strides=strides)
    out = ours.apply(
        {"params": {"Conv_0": {"kernel": kernel, "bias": bias}}}, x
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-5
    )


def test_masked_conv_transpose_matches_reference():
    import haiku as hk

    ref_pcnn = _import_reference("posterior_matching.models.pixel_cnn")
    from posterior_matching_tpu.models.pixelcnn import _MaskedConvTranspose

    # up_sample specs at (rows, cols) = (5, 3):
    # vertical: (2h-2, w+1) valid rows [h-2, kh), cols [0, w)
    # horizontal: (2h-2, 2w-2) valid rows [h-2, kh), cols [w-2, kw)
    for kernel_size, vrows, vcols in [
        ((6, 4), (2, 6), (0, 3)),
        ((2, 2), (0, 2), (1, 2)),
    ]:
        features = 8
        x = np.random.RandomState(1).randn(2, 6, 6, 5).astype(np.float32)
        mask = ref_pcnn._make_kernel_constraint(kernel_size, vrows, vcols)

        def ref_fwd(inp):
            return ref_pcnn._Conv2DTranspose(
                output_channels=features,
                kernel_shape=kernel_size,
                stride=(2, 2),
                padding="SAME",
                mask=mask,
            )(inp)

        ref_model = hk.transform(ref_fwd)
        ref_params = ref_model.init(jax.random.PRNGKey(0), x)
        ref_out = ref_model.apply(ref_params, None, x)

        ((_, wb),) = ref_params.items()
        # hk transpose kernels are (kh, kw, O, I); flax wants (kh, kw, I, O).
        kernel = np.asarray(wb["w"]).transpose(0, 1, 3, 2)
        bias = np.asarray(wb["b"])

        ours = _MaskedConvTranspose(features, kernel_size, vrows, vcols)
        out = ours.apply(
            {"params": {"ConvTranspose_0": {"kernel": kernel, "bias": bias}}},
            x,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-5,
            err_msg=f"transpose conv {kernel_size} {vrows} {vcols}",
        )


# ---------------------------------------------------------------------------
# DMoL (reference vdvae.py:331-433)
# ---------------------------------------------------------------------------


def _dmol_params(b=2, h=4, w=4, m=3, c=3, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, h, w, m).astype(np.float32)
    locs = rng.uniform(-1.2, 1.2, (b, h, w, m, c)).astype(np.float32)
    scales = (
        np.log1p(np.exp(rng.randn(b, h, w, m, c))) + np.exp(-7.0)
    ).astype(np.float32)
    coeffs = rng.uniform(-1, 1, (b, h, w, m, c * (c - 1) // 2)).astype(
        np.float32
    )
    value = rng.randint(0, 256, (b, h, w, c)).astype(np.float32)
    # Force quantization edge cases through the low/high branches.
    value[0, 0, 0, 0] = 0.0
    value[0, 0, 1, -1] = 255.0
    value[1, 3, 3, :] = 255.0
    return logits, locs, scales, coeffs, value


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("independent", [True, False])
def test_dmol_log_prob_matches_reference(channels, independent):
    ref_vdvae = _import_reference("posterior_matching.models.vdvae")
    from posterior_matching_tpu.distributions.logistic import (
        QuantizedLogisticMixture,
    )

    logits, locs, scales, coeffs, value = _dmol_params(c=channels)
    ref_dist = ref_vdvae._LogisticMixtureDist(
        channels, logits, locs, scales,
        coeffs if channels > 1 else None, 0.0, 255.0,
    )
    ref_lp = ref_dist.log_prob(value, independent=independent)

    ours = QuantizedLogisticMixture(
        component_logits=jnp.asarray(logits),
        locs=jnp.asarray(locs),
        scales=jnp.asarray(scales),
        coeffs=jnp.asarray(coeffs) if channels > 1 else None,
        low=0.0,
        high=255.0,
        num_channels=channels,
    )
    lp = ours.log_prob(jnp.asarray(value), independent=independent)
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(ref_lp), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("channels", [1, 3])
def test_dmol_mean_matches_reference(channels):
    ref_vdvae = _import_reference("posterior_matching.models.vdvae")
    from posterior_matching_tpu.distributions.logistic import (
        QuantizedLogisticMixture,
    )

    logits, locs, scales, coeffs, _ = _dmol_params(c=channels, seed=3)
    ref_dist = ref_vdvae._LogisticMixtureDist(
        channels, logits, locs, scales,
        coeffs if channels > 1 else None, 0.0, 255.0,
    )
    ours = QuantizedLogisticMixture(
        component_logits=jnp.asarray(logits),
        locs=jnp.asarray(locs),
        scales=jnp.asarray(scales),
        coeffs=jnp.asarray(coeffs) if channels > 1 else None,
        low=0.0,
        high=255.0,
        num_channels=channels,
    )
    # Means round to integers; values this size compare exactly except where
    # a value sits within float noise of a .5 boundary — compare unrounded
    # closeness instead by allowing a 1-level difference at boundaries.
    ref_mean = np.asarray(ref_dist.mean())
    our_mean = np.asarray(ours.mean())
    assert np.all(np.abs(ref_mean - our_mean) <= 1.0)
    assert np.mean(np.abs(ref_mean - our_mean) > 0) < 0.01


def test_dmol_reference_mean_clip_quirk():
    """The reference clips each channel's logistic mean to [-1, 1] BEFORE
    feeding it to later channels' coupling (vdvae.py:421-428). Verify we
    reproduce the clipped behavior bit-for-bit on out-of-range locs."""
    ref_vdvae = _import_reference("posterior_matching.models.vdvae")
    from posterior_matching_tpu.distributions.logistic import (
        QuantizedLogisticMixture,
    )

    rng = np.random.RandomState(7)
    b, h, w, m, c = 1, 2, 2, 2, 3
    logits = rng.randn(b, h, w, m).astype(np.float32)
    locs = rng.uniform(-3.0, 3.0, (b, h, w, m, c)).astype(np.float32)  # OOR
    scales = np.full((b, h, w, m, c), 0.3, np.float32)
    coeffs = rng.uniform(-1, 1, (b, h, w, m, 3)).astype(np.float32)

    ref_mean = ref_vdvae._LogisticMixtureDist(
        c, logits, locs, scales, coeffs, 0.0, 255.0
    ).mean()
    our_mean = QuantizedLogisticMixture(
        component_logits=jnp.asarray(logits), locs=jnp.asarray(locs),
        scales=jnp.asarray(scales), coeffs=jnp.asarray(coeffs),
        low=0.0, high=255.0, num_channels=c,
    ).mean()
    np.testing.assert_allclose(np.asarray(our_mean), np.asarray(ref_mean))


# ---------------------------------------------------------------------------
# VDVAE config-string helpers (reference vdvae.py:213-240)
# ---------------------------------------------------------------------------


def test_layer_string_helpers_match_reference():
    ref_vdvae = _import_reference("posterior_matching.models.vdvae")
    from posterior_matching_tpu.models import vdvae as ours

    # The grammar cases + the shipped MNIST config strings
    # (reference configs/pm_vdvae_mnist.py).
    strings = [
        "28x6",
        "28x6,28d2,14x4,14d2,7x3,7d7,1x2",
        "1x2,4m1,4x2,8m4,8x4,14m8,14x6,28m14,28x10",
        "32,16d2,8",
    ]
    for s in strings:
        assert ours.parse_layer_string(s) == ref_vdvae.parse_layer_string(s), s

    for width, spec in [(192, None), (192, "28:96,14:128"), (64, "1:8")]:
        ref_map = ref_vdvae.get_width_settings(width, spec)
        our_map = ours.get_width_settings(width, spec)
        for res in [1, 4, 7, 8, 14, 28]:
            assert our_map[res] == ref_map[res], (width, spec, res)

    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 3), jnp.float32)
    ref_padded = ref_vdvae.pad_channels(x, 16)
    assert ref_padded.shape == (2, 4, 4, 16)
    np.testing.assert_allclose(np.asarray(ref_padded[..., :3]), np.asarray(x))
    np.testing.assert_allclose(np.asarray(ref_padded[..., 3:]), 0.0)


# ---------------------------------------------------------------------------
# KL(diag || TriL): pm_kl formula (reference vdvae.py:546-569)
# ---------------------------------------------------------------------------


def test_kl_diag_tril_matches_independent_implementation():
    """Our unrolled-substitution KL vs the shim's jax.scipy solve_triangular
    implementation — two fully independent code paths for the same formula,
    including the tfp FillScaleTriL raw->matrix layout on the TriL side."""
    shim_d = _import_reference("tensorflow_probability.substrates.jax.distributions")
    shim_b = _import_reference("tensorflow_probability.substrates.jax.bijectors")
    from posterior_matching_tpu.distributions.normal import (
        MultivariateNormalDiag,
        MultivariateNormalTriL,
    )

    rng = np.random.RandomState(0)
    batch, k = 7, 16
    loc_p = rng.randn(batch, k).astype(np.float32)
    scale_p = np.log1p(np.exp(rng.randn(batch, k))).astype(np.float32) + 1e-5
    loc_q = rng.randn(batch, k).astype(np.float32)
    raw = rng.randn(batch, k * (k + 1) // 2).astype(np.float32)
    tril = shim_b.FillScaleTriL()(jnp.asarray(raw))

    ref_kl = shim_d.MultivariateNormalDiag(loc_p, scale_p).kl_divergence(
        shim_d.MultivariateNormalTriL(loc_q, tril)
    )
    our_kl = MultivariateNormalDiag(
        jnp.asarray(loc_p), jnp.asarray(scale_p)
    ).kl_divergence(
        MultivariateNormalTriL(jnp.asarray(loc_q), tril)
    )
    np.testing.assert_allclose(
        np.asarray(our_kl), np.asarray(ref_kl), rtol=2e-4, atol=2e-4
    )


def test_tril_log_prob_matches_independent_implementation():
    shim_d = _import_reference("tensorflow_probability.substrates.jax.distributions")
    shim_b = _import_reference("tensorflow_probability.substrates.jax.bijectors")
    from posterior_matching_tpu.distributions.normal import (
        MultivariateNormalTriL,
    )

    rng = np.random.RandomState(1)
    batch, k = 5, 12
    loc = rng.randn(batch, k).astype(np.float32)
    raw = rng.randn(batch, k * (k + 1) // 2).astype(np.float32)
    x = rng.randn(batch, k).astype(np.float32)
    tril = shim_b.FillScaleTriL()(jnp.asarray(raw))

    ref_lp = shim_d.MultivariateNormalTriL(loc, tril).log_prob(x)
    our_lp = MultivariateNormalTriL(jnp.asarray(loc), tril).log_prob(
        jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(our_lp), np.asarray(ref_lp), rtol=1e-4, atol=1e-4
    )


# ---------------------------------------------------------------------------
# Mask generators (reference masking.py) — distributional parity
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_masking():
    return _import_reference("posterior_matching.masking")


def _our_masks(name, shape, n, seed=0, **kwargs):
    from posterior_matching_tpu import masking

    gen = masking.get_mask_generator(name, **kwargs)
    out = []
    key = jax.random.PRNGKey(seed)
    for _ in range(n):
        key, k = jax.random.split(key)
        out.append(np.asarray(gen(k, shape)))
    return np.concatenate(out, axis=0)


def test_uniform_mask_distribution(ref_masking):
    d, b, reps = 64, 256, 8
    ref = ref_masking.UniformMaskGenerator(seed=0)
    ref_s = np.concatenate([ref((b, d)) for _ in range(reps)], 0)
    ours = _our_masks("UniformMaskGenerator", (b, d), reps)

    # Row density is q/d with q ~ U{0..d-1}: mean .5-1/2d, std ~ .289
    assert abs(ref_s.mean() - ours.mean()) < 0.02
    assert abs(ref_s.sum(-1).std() - ours.sum(-1).std()) < 2.0
    # Positions uniform: per-feature rates flat on both sides
    assert abs(ref_s.mean(0).std() - ours.mean(0).std()) < 0.02


def test_uniform_mask_bounds_distribution(ref_masking):
    # The mnist16 config bounds (0, 0.2): q = int(.2 d) + choice NEVER fires
    # with l=0 -> q in [0, int(.2 d)). Reproduce the quirk exactly.
    d, b, reps = 256, 128, 8
    ref = ref_masking.UniformMaskGenerator(seed=0, bounds=(0.0, 0.2))
    ref_s = np.concatenate([ref((b, d)) for _ in range(reps)], 0)
    ours = _our_masks(
        "UniformMaskGenerator", (b, d), reps, bounds=(0.0, 0.2)
    )
    ref_counts = ref_s.sum(-1)
    our_counts = ours.sum(-1)
    assert ref_counts.max() <= int(0.2 * d) - 1
    assert our_counts.max() <= int(0.2 * d) - 1
    assert abs(ref_counts.mean() - our_counts.mean()) < 2.5
    assert abs(ref_counts.std() - our_counts.std()) < 2.0


def test_bernoulli_mask_distribution(ref_masking):
    ref = ref_masking.BernoulliMaskGenerator(p=0.5, seed=0)
    ref_s = ref((2048, 32))
    ours = _our_masks("BernoulliMaskGenerator", (2048, 32), 1, p=0.5)
    assert abs(ref_s.mean() - ours.mean()) < 0.01


def test_rectangle_mask_distribution(ref_masking):
    shape = (64, 28, 28, 1)
    reps = 8
    ref = ref_masking.RectangleMaskGenerator(seed=0)
    ref_s = np.concatenate([ref(shape) for _ in range(reps)], 0)
    ours = _our_masks("RectangleMaskGenerator", shape, reps)

    ref_area = 1.0 - ref_s.mean((1, 2, 3))
    our_area = 1.0 - ours.mean((1, 2, 3))
    # Same rejection bounds [0.3, 1.0] on the hidden area...
    assert ref_area.min() >= 0.3 - 1e-6 and our_area.min() >= 0.3 - 1e-6
    # ...and matching distribution of accepted areas.
    assert abs(ref_area.mean() - our_area.mean()) < 0.025
    assert abs(ref_area.std() - our_area.std()) < 0.025
    for q in (0.25, 0.5, 0.75):
        assert (
            abs(
                np.quantile(ref_area, q) - np.quantile(our_area, q)
            )
            < 0.04
        ), q


def test_random_pattern_mask_distribution(ref_masking):
    """Weak-point check (VERDICT): our 2048^2 canvas vs the reference's
    10000^2 — the crop-density distribution must match the reference
    generator's empirically. Both use the same low-res noise frequency
    (low cells of ~16.7 px), so crops are statistically exchangeable."""
    from posterior_matching_tpu.masking import random_pattern_mask

    shape = (64, 64, 64, 1)
    reps = 6
    ref = ref_masking.RandomPatternMaskGenerator(
        max_size=10000, resolution=0.06, seed=0
    )
    ref_s = np.concatenate([ref(shape) for _ in range(reps)], 0)

    key = jax.random.PRNGKey(0)
    out = []
    for _ in range(reps):
        key, k = jax.random.split(key)
        out.append(np.asarray(random_pattern_mask(k, shape)))
    ours = np.concatenate(out, 0)

    # Hidden density (pattern coverage) is rejected to 0.25 +- 0.05.
    ref_cov = 1.0 - ref_s.mean((1, 2, 3))
    our_cov = 1.0 - ours.mean((1, 2, 3))
    assert np.all(np.abs(ref_cov - 0.25) < 0.05 + 1e-6)
    assert np.all(np.abs(our_cov - 0.25) < 0.0505)
    assert abs(ref_cov.mean() - our_cov.mean()) < 0.012
    assert abs(ref_cov.std() - our_cov.std()) < 0.012


def _seed_generator_tree(gen, counter=None):
    """Deterministically re-seeds a reference MaskGenerator and its nested
    sub-generators (their constructors self-seed from entropy, which made
    this statistical test flake run-to-run)."""
    if counter is None:
        counter = iter(range(10_000))
    gen._rng = np.random.RandomState(1000 + next(counter))
    for sub in getattr(gen, "_generators", []):
        _seed_generator_tree(sub, counter)


def test_mixture_mask_density(ref_masking):
    """Dataset mixtures: overall observed-density parity (the mixtures are
    built from already-tested components; this checks weights/wiring)."""
    cases = [
        ("MNISTMaskGenerator", (64, 28, 28, 1), {"seed": 0}),
        ("CelebAMaskGenerator", (64, 64, 64, 1), {}),
    ]
    reps = 6
    for name, shape, ctor_kwargs in cases:
        ref = ref_masking.get_mask_generator(name, **ctor_kwargs)
        # The reference constructors take no seed for the nested mixtures;
        # fix every sub-generator's RandomState so both sides of the
        # comparison are deterministic (ours is PRNGKey-seeded already).
        _seed_generator_tree(ref)
        ref_s = np.concatenate([ref(shape) for _ in range(reps)], 0)
        ours = _our_masks(name, shape, reps)
        assert abs(ref_s.mean() - ours.mean()) < 0.03, name


# ---------------------------------------------------------------------------
# PRD score + clustering accuracy (pure numpy/sklearn reference code)
# ---------------------------------------------------------------------------


def test_prd_matches_reference_vendored_implementation():
    """Our eval/prd.py vs the reference's vendored prd_score.py (runs
    directly — numpy/sklearn only) on the same embeddings: PRD curves and
    max-F_beta pairs must agree to float tolerance."""
    ref_prd = _import_reference("posterior_matching.prd.prd_score")
    from posterior_matching_tpu.eval.prd import (
        compute_prd_from_embedding,
        prd_to_max_f_beta_pair,
    )

    rng = np.random.RandomState(0)
    real = np.concatenate(
        [rng.randn(150, 8), rng.randn(100, 8) * 0.5 + 2.0]
    )
    fake = np.concatenate(
        [rng.randn(120, 8) * 1.2, rng.randn(130, 8) * 0.4 + 1.5]
    )

    # identical clustering: fix num_runs=1 and seed sklearn via the data
    # order; compare through the same bin histogram by feeding the SAME
    # cluster assignment path (both implementations call MiniBatchKMeans
    # internally with their own seeds, so compare the curve computed from
    # identical histograms instead).
    counts_ref = ref_prd._cluster_into_bins(real, fake, 10)
    prec_ref, rec_ref = ref_prd.compute_prd(
        counts_ref[0], counts_ref[1], num_angles=101
    )
    from posterior_matching_tpu.eval import prd as my_prd

    prec, rec = my_prd.compute_prd(
        counts_ref[0], counts_ref[1], num_angles=101
    )
    np.testing.assert_allclose(prec, prec_ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(rec, rec_ref, rtol=1e-6, atol=1e-6)

    f_ref = ref_prd.prd_to_max_f_beta_pair(prec_ref, rec_ref, beta=8)
    f_mine = prd_to_max_f_beta_pair(prec, rec, beta=8)
    np.testing.assert_allclose(f_mine, f_ref, rtol=1e-6)

    # end-to-end (each implementation seeds its own MiniBatchKMeans):
    # statistically close only — the rigorous check is the identical-
    # histogram comparison above
    ours_e2e = compute_prd_from_embedding(
        eval_data=fake, ref_data=real, num_clusters=10,
        num_angles=101, num_runs=10,
    )
    ref_e2e = ref_prd.compute_prd_from_embedding(
        fake, real, num_clusters=10, num_angles=101, num_runs=10
    )
    f_o = prd_to_max_f_beta_pair(ours_e2e[0], ours_e2e[1], beta=8)
    f_r = ref_prd.prd_to_max_f_beta_pair(ref_e2e[0], ref_e2e[1], beta=8)
    assert abs(f_o[0] - f_r[0]) < 0.15 and abs(f_o[1] - f_r[1]) < 0.15


def test_clustering_accuracy_matches_reference():
    ref_clustering = _import_reference("posterior_matching.clustering")
    from posterior_matching_tpu.eval.clustering import clustering_accuracy

    rng = np.random.RandomState(0)
    labels = rng.randint(0, 5, 500)
    # predictions = a noisy permutation of the labels
    perm = rng.permutation(5)
    preds = perm[labels]
    flip = rng.rand(500) < 0.2
    preds[flip] = rng.randint(0, 5, flip.sum())

    ours = clustering_accuracy(labels, preds)
    ref = ref_clustering.clustering_accuracy(labels, preds)
    np.testing.assert_allclose(ours, ref, rtol=1e-9)


# ---------------------------------------------------------------------------
# Shim self-check: tfp Independent default semantics
# ---------------------------------------------------------------------------


def test_shim_independent_default_reduces_all_but_leftmost():
    """tfp's ``Independent(dist)`` (no reinterpreted_batch_ndims) soaks up
    ALL of the inner distribution's batch dims except the leftmost. The
    reference VDVAE relies on this to reduce its [b, h, w]-batched block
    posteriors to per-instance KLs (reference vdvae.py:543-571); a shim that
    reduced only one dim made ``sum(d["kl"] for d in stats)`` add
    incompatible [b, res] tensors across resolutions."""
    for p in (SHIM_ROOT,):
        if p not in sys.path:
            sys.path.append(p)
    from tensorflow_probability.substrates.jax import distributions as tfd

    rng = np.random.RandomState(0)
    loc = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
    scale = jnp.asarray(np.exp(rng.randn(2, 4, 4, 3) * 0.1), jnp.float32)

    # MVN event soaks the last dim; Independent's default the middle two.
    post = tfd.Independent(tfd.MultivariateNormalDiag(loc, scale))
    prior = tfd.Independent(tfd.MultivariateNormalDiag(
        jnp.zeros_like(loc), jnp.ones_like(scale)))
    kl = post.kl_divergence(prior)
    assert kl.shape == (2,)
    lp = post.log_prob(loc)
    assert lp.shape == (2,)

    # Explicit ndims still honored (the DMoL head uses 1 and 2).
    comp = tfd.Independent(tfd.Normal(loc, scale), reinterpreted_batch_ndims=1)
    assert comp.log_prob(loc).shape == (2, 4, 4)

    # The default on a rank-2-batch inner dist reduces exactly one dim —
    # the VaDE decoder path (reference distributions.py:15-17).
    flat = tfd.Independent(tfd.Normal(loc.reshape(2, 48),
                                      scale.reshape(2, 48)))
    assert flat.log_prob(loc.reshape(2, 48)).shape == (2,)
