"""VDVAE block-chain Pallas kernels (ops/block_chain.py) vs the unfused
flax Block stack — values and grads, interpret mode on CPU.

The fused path slices/stacks the SAME params at apply time (checkpoint ABI
untouched), so the contract is: same param tree, same outputs, same grads
(float32; the kernels keep the residual stream and c4 in f32 exactly like
models/vdvae.py::Block's dtype rules)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posterior_matching_tpu.models.vdvae import (
    Encoder,
    PosteriorMatchingVDVAE,
)

ENC_KW = dict(
    width=16,
    blocks="8x3,8d2,4x2,4d4,1x2",
    bottleneck_multiple=0.5,
)


def _data(b=2, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(b, 8, 8, 1), jnp.float32)


def test_encoder_fused_matches_unfused():
    x = _data()
    enc_ref = Encoder(fused_chain=False, **ENC_KW)
    enc_fused = Encoder(fused_chain="interpret", **ENC_KW)
    params = enc_ref.init(jax.random.PRNGKey(0), x)["params"]
    # identical param tree whichever path builds it
    params_f = enc_fused.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_f)
    for (pa, a), (_, b_) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(params_f), key=str),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b_), err_msg=str(pa)
        )

    acts_ref = enc_ref.apply({"params": params}, x)
    acts_fused = enc_fused.apply({"params": params}, x)
    assert set(acts_ref) == set(acts_fused)
    for res in acts_ref:
        np.testing.assert_allclose(
            np.asarray(acts_fused[res]), np.asarray(acts_ref[res]),
            rtol=1e-5, atol=1e-6, err_msg=f"activations at res {res}",
        )


def test_encoder_fused_grads_match():
    x = _data(b=4, seed=1)
    enc_ref = Encoder(fused_chain=False, **ENC_KW)
    enc_fused = Encoder(fused_chain="interpret", **ENC_KW)
    params = enc_ref.init(jax.random.PRNGKey(0), x)["params"]

    def loss(enc):
        def f(p, x):
            acts = enc.apply({"params": p}, x)
            return sum(jnp.sum(a ** 2) for a in acts.values())
        return f

    (v_r, g_r) = jax.value_and_grad(loss(enc_ref), argnums=(0, 1))(params, x)
    (v_f, g_f) = jax.value_and_grad(loss(enc_fused), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_r), rtol=1e-5)
    for (pa, a), (_, b_) in zip(
        jax.tree_util.tree_leaves_with_path(g_r),
        jax.tree_util.tree_leaves_with_path(g_f),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=1e-5,
            err_msg=f"grad mismatch at {pa}",
        )


def test_full_model_fused_encoder_elbo_matches():
    """The full PM-VDVAE forward (posterior mode) with fused encoders must
    reproduce the unfused ELBO terms."""
    config = {
        "image_shape": [8, 8, 1],
        "latent_dim": 3,
        "width": 16,
        "bottleneck_multiple": 0.5,
        "num_mixtures": 2,
        "encoder_blocks": "8x2,8d2,4x2",
        "decoder_blocks": "4x1,8m4,8x1",
        "no_bias_above": 16,
    }
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 8, 1) * 255, jnp.float32)
    b = jnp.asarray(rng.binomial(1, 0.7, (2, 8, 8, 1)), jnp.float32)

    m_ref = PosteriorMatchingVDVAE.from_config(
        dict(config, fused_chain=False)
    )
    m_fused = PosteriorMatchingVDVAE.from_config(
        dict(config, fused_chain="interpret")
    )
    variables = m_ref.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, b,
    )
    out_r = m_ref.apply(variables, x, b, rngs={"sample": jax.random.PRNGKey(2)})
    out_f = m_fused.apply(
        variables, x, b, rngs={"sample": jax.random.PRNGKey(2)}
    )
    for k in ("reconstruction_ll", "kl", "pm_kl"):
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_r[k]),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )
