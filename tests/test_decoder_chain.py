"""VDVAE DECODER-chain Pallas kernels (ops/decoder_chain.py) vs the unfused
per-block path — values and grads, interpret mode on CPU.

The fused run draws its reparameterization eps through each block's own
``make_rng("sample")`` (models/vdvae.py::DecoderBlock.sample_rng), so the
noise — and therefore every forward value — matches the unfused
``forward_posterior`` to float tolerance; gradients flow through the same
stop-gradient structure (pm stats, masked-posterior x input)."""
import jax
import jax.numpy as jnp
import numpy as np

from posterior_matching_tpu.models.vdvae import PosteriorMatchingVDVAE

# small geometry with one fusable run per resolution (8x3 -> run of 3 at
# res 8; 4m8,4x2 -> mixin + run; 1x2 falls back: 2*1*1 rows violate the
# sublane rule, exercising the unfused fallback inside a fused model)
KW = dict(
    image_shape=(8, 8, 1),
    encoder_blocks="8x2,8d2,4x2,4d4,1x2",
    decoder_blocks="1x2,4m1,4x2,8m4,8x3",
    latent_dim=4,
    width=16,
    bottleneck_multiple=0.5,
)


def _data(b=2, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randint(0, 256, (b, 8, 8, 1)), jnp.float32)
    m = jnp.asarray(rng.rand(b, 8, 8, 1) > 0.5, jnp.float32)
    return x, m


def _apply(model, params, x, m, seed=7):
    return model.apply(
        {"params": params}, x, m,
        rngs={"sample": jax.random.PRNGKey(seed)},
    )


def test_decoder_fused_matches_unfused():
    x, m = _data()
    ref = PosteriorMatchingVDVAE(fused_chain=False, **KW)
    fused = PosteriorMatchingVDVAE(fused_chain="interpret", **KW)
    params = ref.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, m,
    )["params"]
    params_f = fused.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, m,
    )["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_f)

    out_r = _apply(ref, params, x, m)
    out_f = _apply(fused, params, x, m)
    for key in ("reconstruction_ll", "kl", "pm_kl"):
        np.testing.assert_allclose(
            np.asarray(out_f[key]), np.asarray(out_r[key]),
            rtol=2e-4, atol=2e-4, err_msg=key,
        )


def test_decoder_fused_grads_match():
    x, m = _data(seed=3)
    ref = PosteriorMatchingVDVAE(fused_chain=False, **KW)
    fused = PosteriorMatchingVDVAE(fused_chain="interpret", **KW)
    params = ref.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, m,
    )["params"]

    def loss(model):
        def f(p):
            out = _apply(model, p, x, m)
            return jnp.mean(
                out["kl"] + out["pm_kl"] - out["reconstruction_ll"]
            )
        return f

    v_r, g_r = jax.value_and_grad(loss(ref))(params)
    v_f, g_f = jax.value_and_grad(loss(fused))(params)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_r), rtol=1e-4)
    for (pa, a), (_, b_) in zip(
        jax.tree_util.tree_leaves_with_path(g_r),
        jax.tree_util.tree_leaves_with_path(g_f),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-3, atol=1e-4,
            err_msg=f"grad mismatch at {pa}",
        )
