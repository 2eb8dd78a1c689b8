"""Distributional-parity tests for on-device mask generators vs the reference
semantics (reference posterior_matching/masking.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posterior_matching_tpu import masking


def test_uniform_mask_counts_distribution():
    b, d = 2000, 16
    m = masking.uniform_mask(jax.random.PRNGKey(0), (b, d))
    m = np.asarray(m)
    assert m.shape == (b, d)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    counts = m.sum(-1)
    # counts should be ~uniform over {0..d-1}
    hist = np.bincount(counts.astype(int), minlength=d)
    assert hist[: d].min() > b / d * 0.5
    assert counts.max() <= d - 1
    # given count q, the subset should be uniform: per-position freq ~ mean(q)/d
    freq = m.mean(0)
    np.testing.assert_allclose(freq, freq.mean(), atol=0.05)


def test_uniform_mask_bounds():
    b, d = 1000, 20
    m = np.asarray(
        masking.uniform_mask(
            jax.random.PRNGKey(1), (b, d), bounds=(0.2, 0.5)
        )
    )
    counts = m.sum(-1)
    lo = int(d * 0.2)
    hi = int(d * 0.5)
    assert counts.min() >= lo
    assert counts.max() <= lo + hi - 1


def test_bernoulli_mask_rate():
    m = np.asarray(
        masking.bernoulli_mask(jax.random.PRNGKey(2), (500, 30), p=0.3)
    )
    np.testing.assert_allclose(m.mean(), 0.3, atol=0.02)


def test_image_bernoulli_shape():
    m = masking.image_bernoulli_mask(jax.random.PRNGKey(3), (8, 28, 28, 3))
    assert m.shape == (8, 28, 28, 1)


def test_rectangle_mask_area_bounds():
    b, h, w = 256, 28, 28
    m = np.asarray(
        masking.rectangle_mask(
            jax.random.PRNGKey(4), (b, h, w, 1), min_prop=0.3, max_prop=1.0
        )
    )
    assert m.shape == (b, h, w, 1)
    hidden = 1.0 - m
    areas = hidden.sum((1, 2, 3))
    assert (areas >= 0.3 * h * w).all()
    assert (areas <= 1.0 * h * w).all()
    # each hidden region must be a contiguous rectangle
    for i in range(10):
        ys, xs = np.where(hidden[i, :, :, 0] > 0)
        rect_area = (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1)
        assert rect_area == len(ys)


def test_fixed_rectangle_mask():
    m = np.asarray(
        masking.fixed_rectangle_mask(
            jax.random.PRNGKey(5), (4, 28, 28, 1), y1=0, x1=0, y2=28, x2=14
        )
    )
    assert (m[:, :, :14] == 0).all()
    assert (m[:, :, 14:] == 1).all()


def test_square_mask():
    b, h, w, size = 64, 28, 28, 14
    m = np.asarray(
        masking.square_mask(jax.random.PRNGKey(6), (b, h, w, 1), size=size)
    )
    hidden = 1.0 - m
    areas = hidden.sum((1, 2, 3))
    np.testing.assert_allclose(areas, size * size)
    # squares should differ across the batch (per-element randomness)
    assert len(np.unique(hidden.reshape(b, -1), axis=0)) > 10


def test_random_pattern_mask_density():
    b, h, w = 64, 64, 64
    m = np.asarray(
        masking.random_pattern_mask(
            jax.random.PRNGKey(7), (b, h, w, 1), density=0.25
        )
    )
    hidden_frac = 1.0 - m.mean((1, 2, 3))
    # density rejection keeps coverage near 0.25 (best-of-K may rarely miss)
    assert (np.abs(hidden_frac - 0.25) < 0.08).all()


def test_mixture_mask_uses_all_components():
    gens, weights = masking.mnist_mask_spec(28)
    key = jax.random.PRNGKey(8)
    m = np.asarray(
        masking.mixture_mask(key, (512, 28, 28, 1), gens, weights)
    )
    assert m.shape == (512, 28, 28, 1)
    fracs = 1.0 - m.mean((1, 2, 3))
    # mixture should produce diverse mask densities
    assert fracs.std() > 0.1


def test_mixture_mask_batch_level():
    """batch_level=True (reference masking.py:39-42): ONE component per
    batch. Pin it with two extreme components — all-observed vs
    all-hidden — so every batch must be homogeneous, and check both
    components appear across keys at roughly their weights."""
    ones = lambda k, s: jnp.ones(s, jnp.float32)
    zeros = lambda k, s: jnp.zeros(s, jnp.float32)
    f = jax.jit(
        lambda k: masking.mixture_mask(
            k, (16, 4, 4, 1), [ones, zeros], [0.5, 0.5], batch_level=True
        ),
        static_argnums=(),
    )
    means = np.array(
        [float(np.mean(np.asarray(f(jax.random.PRNGKey(i))))) for i in range(200)]
    )
    # each batch is entirely one component...
    assert set(np.unique(means)).issubset({0.0, 1.0})
    # ...and both occur at ~their mixture weights
    assert 0.35 < means.mean() < 0.65
    # contrast: batch_level=False mixes per instance (some batch is mixed)
    per_inst = np.array([
        float(np.mean(np.asarray(masking.mixture_mask(
            jax.random.PRNGKey(i), (16, 4, 4, 1), [ones, zeros], [0.5, 0.5]
        )))) for i in range(20)
    ])
    assert ((per_inst > 0.0) & (per_inst < 1.0)).any()


def test_random_pattern_update_freq_pool():
    """update_freq (reference masking.py:227-228): canvas regeneration is
    realized as a key-selected pool of iid canvases. Distinct calls must be
    able to land on DIFFERENT canvases (crops at the same canvas coordinates
    differ across some key pairs) while density rejection still holds."""
    kw = dict(
        density=0.25, canvas_size=256, update_freq=1.0, num_canvases=3
    )
    ms = [
        np.asarray(masking.random_pattern_mask(
            jax.random.PRNGKey(i), (8, 32, 32, 1), **kw
        ))
        for i in range(8)
    ]
    for m in ms:
        hidden = 1.0 - m.mean((1, 2, 3))
        assert (np.abs(hidden - 0.25) < 0.1).all()
    # the pool actually switches canvases: with 3 canvases and 8 keys the
    # chance all land on one canvas is 3^-7 ~ 5e-4; different canvases give
    # different masks even when crop coordinates collide somewhere
    assert any(
        not np.array_equal(ms[0], m) for m in ms[1:]
    )
    # default single-canvas path unchanged: update_freq=None stays
    # deterministic per key
    a = masking.random_pattern_mask(
        jax.random.PRNGKey(3), (4, 32, 32, 1), canvas_size=256
    )
    b = masking.random_pattern_mask(
        jax.random.PRNGKey(3), (4, 32, 32, 1), canvas_size=256
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_celeb_a_mask_generator():
    gen = masking.get_mask_generator("CelebAMaskGenerator")
    m = np.asarray(gen(jax.random.PRNGKey(9), (32, 64, 64, 3)))
    assert m.shape == (32, 64, 64, 1)
    assert set(np.unique(m)).issubset({0.0, 1.0})


def test_registry_names_match_reference():
    for name in [
        "BernoulliMaskGenerator",
        "UniformMaskGenerator",
        "MNISTMaskGenerator",
        "OmniglotMaskGenerator",
        "CelebAMaskGenerator",
    ]:
        gen = masking.get_mask_generator(name)
        shape = (4, 28, 28, 1) if "Mask" in name and name not in (
            "BernoulliMaskGenerator", "UniformMaskGenerator"
        ) else (4, 16)
        if name == "CelebAMaskGenerator":
            shape = (4, 64, 64, 3)
        m = gen(jax.random.PRNGKey(0), shape)
        assert np.asarray(m).min() >= 0 and np.asarray(m).max() <= 1


def test_add_mask_inside_jit():
    """Mask generation must trace into a jitted step (the fusion claim)."""
    gen = masking.get_mask_generator("UniformMaskGenerator")

    @jax.jit
    def step(batch, key):
        out = masking.add_mask(batch, key, gen)
        return out["mask"].sum()

    batch = {"features": jnp.ones((8, 10))}
    val = step(batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(val))


def test_mask_generator_kwargs_from_config():
    gen = masking.get_mask_generator(
        "UniformMaskGenerator", bounds=[0.0, 0.2]
    )
    m = np.asarray(gen(jax.random.PRNGKey(1), (100, 256)))
    assert m.sum(-1).max() <= int(256 * 0.2)


def test_random_pattern_sat_selection_matches_full_crops():
    """The summed-area-table density pass must pick EXACTLY the crops the
    materialized [B, K, H, W] formulation picks (it replaced that path for
    performance; selection semantics are part of the generator's contract)."""
    import functools

    from posterior_matching_tpu.masking import (
        _PatternCanvas,
        _REJECTION_CANDIDATES,
        random_pattern_mask,
    )

    def full_crop_reference(key, shape, resolution, density, density_std,
                            canvas_size, canvas_seed):
        b, h, w = shape[0], shape[1], shape[2]
        canvas = _PatternCanvas.get(
            canvas_size, resolution, density, canvas_seed
        )
        k = _REJECTION_CANDIDATES
        kx, ky = jax.random.split(key)
        xs = jax.random.randint(kx, (b, k), 0, canvas_size - w + 1)
        ys = jax.random.randint(ky, (b, k), 0, canvas_size - h + 1)

        def crop(x, y):
            return jax.lax.dynamic_slice(canvas, (y, x), (h, w))

        crops = jax.vmap(jax.vmap(crop))(xs, ys).astype(jnp.float32)
        coverage = jnp.mean(crops, axis=(-2, -1))
        valid = jnp.abs(coverage - density) < density_std
        first = jnp.argmax(valid, axis=-1)
        closest = jnp.argmin(jnp.abs(coverage - density), axis=-1)
        idx = jnp.where(jnp.any(valid, axis=-1), first, closest)
        picked = jnp.take_along_axis(
            crops, idx[:, None, None, None], axis=1
        )[:, 0]
        return (1.0 - picked)[..., None]

    # power-of-two crop (bit-exact density arithmetic) and a non-power-of-two
    # crop (f32 division may differ by 1 ulp from the crop mean -- still must
    # select identically here; the canvas density field is nowhere near the
    # knife's edge at these seeds)
    for hw, seed in [(32, 0), (28, 1), (64, 2)]:
        shape = (8, hw, hw, 1)
        kwargs = dict(resolution=0.06, density=0.25, density_std=0.05,
                      canvas_size=512, canvas_seed=7)
        key = jax.random.PRNGKey(seed)
        ours = random_pattern_mask(key, shape, **kwargs)
        ref = full_crop_reference(key, shape, **kwargs)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_pattern_canvas_sat_counts_exact():
    """sat[i, j] must equal the number of ones in canvas[:i, :j] for the
    exact canvas the generators use (the SAT feeds the density-rejection
    comparisons, which must match integer crop counts exactly)."""
    from posterior_matching_tpu.masking import _PatternCanvas

    args = (256, 0.06, 0.25, 3)
    canvas = _PatternCanvas.get(*args)
    sat = _PatternCanvas.get_sat(*args)
    assert sat.shape == (257, 257) and sat.dtype == np.int32
    rng = np.random.RandomState(0)
    for _ in range(50):
        y = rng.randint(0, 257)
        x = rng.randint(0, 257)
        assert sat[y, x] == int(canvas[:y, :x].sum())
