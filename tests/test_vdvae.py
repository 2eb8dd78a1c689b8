"""PM-VDVAE tests on a tiny hierarchy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posterior_matching_tpu.models.vdvae import (
    PosteriorMatchingVDVAE,
    get_width_settings,
    parse_layer_string,
    vdvae_impute,
    vdvae_is_log_probs,
)

TINY_CONFIG = {
    "image_shape": (8, 8, 1),
    "encoder_blocks": "8x2,8d2,4x1,4d4,1x1",
    "decoder_blocks": "1x1,4m1,4x1,8m4,8x2",
    "latent_dim": 4,
    "width": 16,
    "bottleneck_multiple": 0.25,
    "no_bias_above": 64,
    "num_mixtures": 3,
}

RGB_CONFIG = dict(TINY_CONFIG, image_shape=(8, 8, 3))


def test_parse_layer_string():
    assert parse_layer_string("28x2,28d2,3m1") == [
        (28, None), (28, None), (28, 2), (3, 1),
    ]
    widths = get_width_settings(128, "28:64,14:96")
    assert widths[28] == 64 and widths[14] == 96 and widths[7] == 128


@pytest.fixture(scope="module")
def tiny_model():
    model = PosteriorMatchingVDVAE.from_config(TINY_CONFIG)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 256, (2, 8, 8, 1)), jnp.float32)
    b = jnp.asarray(rng.binomial(1, 0.7, (2, 8, 8, 1)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, b,
    )
    return model, variables, x, b


def test_forward_posterior(tiny_model):
    model, variables, x, b = tiny_model
    out = model.apply(
        variables, x, b, rngs={"sample": jax.random.PRNGKey(2)}
    )
    assert set(out) == {"reconstruction_ll", "kl", "pm_kl", "reconstruction"}
    assert out["reconstruction_ll"].shape == (2,)
    assert out["kl"].shape == (2,)
    assert out["pm_kl"].shape == (2,)
    assert out["reconstruction"].shape == x.shape
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
    # KLs are nonnegative
    assert (np.asarray(out["kl"]) >= 0).all()
    assert (np.asarray(out["pm_kl"]) >= -1e-4).all()


def test_pm_kl_gradient_only_hits_masked_path(tiny_model):
    """pm_kl uses stop_grad on the posterior side: its gradient w.r.t. the
    full encoder must be zero (reference vdvae.py:546,569)."""
    model, variables, x, b = tiny_model

    def loss(params):
        out = model.apply(
            {"params": params}, x, b,
            rngs={"sample": jax.random.PRNGKey(3)},
        )
        return jnp.mean(out["pm_kl"])

    g = jax.grad(loss)(variables["params"])
    enc_norm = sum(
        float(np.abs(np.asarray(v)).sum())
        for v in jax.tree.leaves(g["encoder"])
    )
    menc_norm = sum(
        float(np.abs(np.asarray(v)).sum())
        for v in jax.tree.leaves(g["masked_encoder"])
    )
    assert enc_norm == 0.0
    assert menc_norm > 0.0


def test_unconditional_sample(tiny_model):
    model, variables, x, b = tiny_model
    samples = model.apply(
        variables, 3, method=model.sample,
        rngs={"sample": jax.random.PRNGKey(4)},
    )
    assert samples.shape == (3, 8, 8, 1)
    s = np.asarray(samples)
    assert s.min() >= 0 and s.max() <= 255


def test_impute(tiny_model):
    model, variables, x, b = tiny_model
    imp = vdvae_impute(
        model, variables, x, b, jax.random.PRNGKey(5), num_samples=3
    )
    assert imp.shape == (2, 3, 8, 8, 1)
    im = np.asarray(imp)
    bm = np.asarray(b)
    for s in range(3):
        np.testing.assert_allclose(im[:, s][bm == 1], np.asarray(x)[bm == 1])


def test_is_log_probs(tiny_model):
    model, variables, x, b = tiny_model
    px, pxu = vdvae_is_log_probs(
        model, variables, x, b, jax.random.PRNGKey(6), num_samples=4
    )
    assert px.shape == (2,)
    assert pxu.shape == (2,)
    assert np.isfinite(np.asarray(px)).all()


def test_is_log_probs_batch_chunk(tiny_model):
    """batch_chunk bounds memory by lax.map-ing sub-batches: exact match when
    chunk >= B, finite/shape-correct values when chunked (incl. a ragged
    batch through the padding path), and chunked estimates statistically
    consistent with the unchunked path."""
    model, variables, x, b = tiny_model
    key = jax.random.PRNGKey(6)

    full = vdvae_is_log_probs(model, variables, x, b, key, num_samples=4)
    big_chunk = vdvae_is_log_probs(
        model, variables, x, b, key, num_samples=4, batch_chunk=8
    )
    np.testing.assert_allclose(
        np.asarray(full[0]), np.asarray(big_chunk[0]), rtol=1e-6
    )

    x4 = jnp.concatenate([x, x], axis=0)
    b4 = jnp.concatenate([b, b], axis=0)
    for chunk in (1, 2, 3):  # 3 exercises the ragged padding path
        px, ac = vdvae_is_log_probs(
            model, variables, x4, b4, key, num_samples=16, batch_chunk=chunk
        )
        assert px.shape == (4,) and ac.shape == (4,)
        assert np.isfinite(np.asarray(px)).all()
        # same instances duplicated -> estimates agree within IS noise
        ref = np.asarray(
            vdvae_is_log_probs(
                model, variables, x4, b4, key, num_samples=16
            )[0]
        )
        assert np.all(np.abs(np.asarray(px) - ref) < 25.0), chunk


def test_rgb_channel_coupling():
    model = PosteriorMatchingVDVAE.from_config(RGB_CONFIG)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randint(0, 256, (2, 8, 8, 3)), jnp.float32)
    b = jnp.asarray(rng.binomial(1, 0.7, (2, 8, 8, 1)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, b,
    )
    out = model.apply(
        variables, x, b, rngs={"sample": jax.random.PRNGKey(2)}
    )
    assert np.isfinite(np.asarray(out["reconstruction_ll"])).all()
    assert out["reconstruction"].shape == x.shape


def test_training_step_reduces_loss(tiny_model):
    import optax

    model, variables, x, b = tiny_model
    params = variables["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def lf(p):
            out = model.apply({"params": p}, x, b, rngs={"sample": key})
            elbo = jnp.mean(out["reconstruction_ll"] - out["kl"])
            return -elbo + jnp.mean(out["pm_kl"])

        loss, g = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    key = jax.random.PRNGKey(7)
    for i in range(15):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_bf16_compute_dtype():
    """compute_dtype='bfloat16' keeps params f32, all losses/stats f32 and
    finite, and the objective close to the f32 path."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 256, (2, 8, 8, 1)).astype(np.float32))
    b = jnp.asarray((rng.rand(2, 8, 8, 1) > 0.3).astype(np.float32))

    def run(dtype):
        model = PosteriorMatchingVDVAE.from_config(
            dict(TINY_CONFIG, compute_dtype=dtype)
        )
        rngs = {
            "params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1),
        }
        variables = model.init(rngs, x, b)
        out = model.apply(
            variables, x, b, rngs={"sample": jax.random.PRNGKey(1)}
        )
        return variables, out

    v32, o32 = run(None)
    v16, o16 = run("bfloat16")
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a: a.dtype == jnp.float32, v16["params"])
    )
    for k in ("reconstruction_ll", "kl", "pm_kl"):
        assert o16[k].dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(o16[k])))
        np.testing.assert_allclose(
            np.asarray(o16[k]), np.asarray(o32[k]), rtol=0.15, atol=3.0
        )
