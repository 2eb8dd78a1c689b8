"""VQ-VAE stack tests: quantizer semantics, EMA updates, model forward."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from posterior_matching_tpu.models.vqvae import (
    VQVAE,
    VQVAEPartialEncoder,
    VectorQuantizer,
)
from posterior_matching_tpu.ops.vq import (
    nearest_codebook_indices_pallas,
    nearest_codebook_indices_xla,
    vq_straight_through,
)


def test_nearest_codebook_exact():
    rng = np.random.RandomState(0)
    z = rng.randn(64, 8).astype(np.float32)
    cb = rng.randn(16, 8).astype(np.float32)
    got = np.asarray(nearest_codebook_indices_xla(jnp.asarray(z), jnp.asarray(cb)))
    want = np.argmin(((z[:, None] - cb[None]) ** 2).sum(-1), axis=-1)
    np.testing.assert_array_equal(got, want)


def test_nearest_codebook_pallas_matches_xla():
    """Exact-match of the Pallas kernel (interpret mode on CPU) against the
    XLA path at the flagship shapes (PM-VQVAE CelebA: N=8192 positions,
    K=512 codes, D=64), plus a ragged-N case through the padding path and a
    tie case (both must break towards the lower index)."""
    rng = np.random.RandomState(1)
    for n, k, d in [(8192, 512, 64), (2048 + 17, 512, 64), (1024, 128, 8)]:
        z = rng.randn(n, d).astype(np.float32)
        cb = rng.randn(k, d).astype(np.float32)
        got = np.asarray(
            nearest_codebook_indices_pallas(
                jnp.asarray(z), jnp.asarray(cb), interpret=True
            )
        )
        want = np.asarray(
            nearest_codebook_indices_xla(jnp.asarray(z), jnp.asarray(cb))
        )
        np.testing.assert_array_equal(got, want, err_msg=str((n, k, d)))

    # exact tie between codes 3 and 7 -> both paths pick 3
    cb = rng.randn(128, 8).astype(np.float32)
    cb[7] = cb[3]
    z = np.tile(cb[3][None], (1024, 1)).astype(np.float32)
    got = np.asarray(
        nearest_codebook_indices_pallas(
            jnp.asarray(z), jnp.asarray(cb), interpret=True
        )
    )
    want = np.asarray(
        nearest_codebook_indices_xla(jnp.asarray(z), jnp.asarray(cb))
    )
    np.testing.assert_array_equal(got, want)
    assert np.all(got == 3)


def test_straight_through_gradient():
    z = jnp.asarray([1.0, 2.0])
    q = jnp.asarray([1.5, 1.5])

    def f(z):
        return jnp.sum(vq_straight_through(z, q) ** 2)

    g = jax.grad(f)(z)
    # forward value is q; gradient wrt z is d(sum(q^2))/dq = 2q (pass-through)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(q))


def test_vector_quantizer_ema_moves_codebook():
    vq = VectorQuantizer(embedding_dim=4, num_embeddings=8, decay=0.5)
    z = jnp.asarray(np.random.RandomState(0).randn(32, 4), jnp.float32)
    variables = vq.init(jax.random.PRNGKey(0), z, is_training=True)
    assert "vq_ema" in variables
    out0, new_state = vq.apply(
        variables, z, is_training=True, mutable=["vq_ema"]
    )
    before = variables["vq_ema"]["embeddings"]
    after = new_state["vq_ema"]["embeddings"]
    assert np.abs(np.asarray(after) - np.asarray(before)).max() > 1e-6
    assert set(out0) == {"quantize", "loss", "perplexity", "encoding_indices"}
    # eval mode must NOT mutate
    _, state2 = vq.apply(new_state, z, is_training=False, mutable=["vq_ema"])
    np.testing.assert_array_equal(
        np.asarray(state2["vq_ema"]["embeddings"]),
        np.asarray(new_state["vq_ema"]["embeddings"]),
    )


def test_vector_quantizer_quantize_lookup():
    vq = VectorQuantizer(embedding_dim=4, num_embeddings=8)
    z = jnp.zeros((2, 4))
    variables = vq.init(jax.random.PRNGKey(0), z)
    idx = jnp.asarray([0, 3, 7])
    q = vq.apply(variables, idx, method=vq.quantize)
    emb = variables["vq_ema"]["embeddings"]
    np.testing.assert_allclose(np.asarray(q), np.asarray(emb)[[0, 3, 7]])


def test_vqvae_forward_and_shapes():
    model = VQVAE(
        output_channels=1,
        embedding_dim=8,
        num_embeddings=16,
        hidden_units=16,
        residual_blocks=1,
        residual_hidden_units=8,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(2, 28, 28, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, is_training=True)
    out, state = model.apply(
        variables, x, is_training=True, mutable=["vq_ema"]
    )
    assert out["vq_output"]["encoding_indices"].shape == (2, 7, 7)
    assert out["reconstruction"].shape == x.shape
    assert np.isfinite(float(out["loss"]))
    # indices -> decode roundtrip
    img = model.apply(
        variables, out["vq_output"]["encoding_indices"],
        method=model.decode_indices,
    )
    assert img.shape == x.shape


def test_vqvae_training_reduces_loss():
    model = VQVAE(
        output_channels=1, embedding_dim=4, num_embeddings=8,
        hidden_units=8, residual_blocks=1, residual_hidden_units=8,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(8, 16, 16, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, is_training=True)
    params = variables["params"]
    state = {"vq_ema": variables["vq_ema"]}
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state):
        def lf(p):
            out, new_state = model.apply(
                {"params": p, **state}, x, is_training=True,
                mutable=["vq_ema"],
            )
            return out["loss"], new_state

        (loss, new_state), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_state, opt_state, loss

    losses = []
    for _ in range(30):
        params, state, opt_state, loss = step(params, state, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_partial_encoder_shapes():
    enc = VQVAEPartialEncoder(
        conditional_dim=32, hidden_units=16, residual_blocks=1,
        residual_hidden_units=8,
    )
    x = jnp.zeros((2, 28, 28, 2))
    variables = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(variables, x)
    assert out.shape == (2, 32)
