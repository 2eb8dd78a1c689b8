"""Model-level reference parity: the reference PM-VAE forward vs ours at
IDENTICAL parameters.

The actual reference `PosteriorMatchingVAE` (ResidualMLP backbones +
distribution heads, /root/reference/posterior_matching/models/vae.py) runs
on CPU over the textbook shims; its haiku params are mapped 1:1 into our
flax tree (`<mod>/linear_i/{w,b}` -> `<mod>/Dense_i/{kernel,bias}`), and the
deterministic forward pieces (posterior parameters, reconstruction LL at the
posterior mean, closed-form KL, matching LL) must agree numerically.

The TriL variant additionally exercises the packing-layout freedom: tfp's
`fill_triangular` and our row-major packing are different bijections, so the
raw-parameter columns of the TriL head's Linear are PERMUTED between the
frameworks. The test computes that permutation from the two layouts and
verifies the remapped params induce the same distribution — evidence that a
trained reference checkpoint could be converted exactly.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE_ROOT = "/root/reference"
SHIM_ROOT = os.path.join(os.path.dirname(__file__), "refshims")

for _p in (SHIM_ROOT, REFERENCE_ROOT):
    if _p not in sys.path:
        sys.path.append(_p)


def _map_params(ref_params, dim_latent=None):
    """haiku `{module: {w|b|log_scale: ...}}` -> flax nested params dict."""
    out = {}
    for mod, leaves in ref_params.items():
        parts = mod.split("/")
        top = parts[0]
        node = out.setdefault(top, {})
        if len(parts) == 1:
            # head-level bare params (e.g. decoder_dist log_scale)
            for k, v in leaves.items():
                if k in ("w", "b"):
                    node.setdefault("Dense_0", {})[
                        "kernel" if k == "w" else "bias"
                    ] = np.asarray(v)
                else:
                    node[k] = np.asarray(v)
        else:
            linear = parts[1]
            idx = 0 if linear == "linear" else int(linear.split("_")[1])
            dense = node.setdefault(f"Dense_{idx}", {})
            for k, v in leaves.items():
                dense["kernel" if k == "w" else "bias"] = np.asarray(v)
    return out


_VAE_CONFIG = dict(
    latent_dim=4,
    encoder_net="ResidualMLP",
    encoder_net_config=dict(residual_blocks=1, hidden_units=16),
    decoder_net="ResidualMLP",
    decoder_net_config=dict(residual_blocks=1, hidden_units=16),
    posterior_dist="DiagonalGaussian",
    decoder_dist="IdentityGaussian",
    decoder_dist_config=dict(event_size=6),
    matching_ll_stop_gradients=True,
)


def _ref_probe(cfg, x, b):
    """Deterministic reference forward: z = posterior mean."""
    import haiku as hk
    from posterior_matching.models.vae import PosteriorMatchingVAE as RefVAE

    def fwd(x, b):
        m = RefVAE.from_config(cfg)
        posterior = m.encoder(x, is_training=False)
        z = posterior.mean()
        decoded = m.decoder(z, is_training=False)
        rec_ll = jnp.sum(decoded.log_prob(x), axis=-1)
        kl = posterior.kl_divergence(m.prior)
        x_o_b = jnp.concatenate([x * b, b], axis=-1)
        pp = m.partial_encoder(x_o_b, is_training=False)
        return {
            "z": z,
            "rec_ll": rec_ll,
            "kl": kl,
            "matching_ll": pp.log_prob(z),
        }

    t = hk.transform(fwd)
    params = t.init(jax.random.PRNGKey(0), x, b)
    # ResidualMLP draws a dropout key even at rate 0 -> apply needs a key;
    # values are key-independent in eval mode.
    return params, t.apply(params, jax.random.PRNGKey(9), x, b)


def _our_probe(cfg, flax_params, x, b):
    from posterior_matching_tpu.models.vae import PosteriorMatchingVAE

    model = PosteriorMatchingVAE.from_config(cfg)
    variables = {"params": flax_params}

    posterior = model.apply(variables, x, method=model.encode)
    z = posterior.mean()
    decoded = model.apply(variables, z, method=model.decode)
    rec_ll = jnp.sum(decoded.log_prob(x), axis=-1)
    prior = model.apply(variables, method=model.prior)
    kl = posterior.kl_divergence(prior)
    x_o_b = jnp.concatenate([x * b, b], axis=-1)
    pp = model.apply(variables, x_o_b, method=model.encode_partial)
    return {
        "z": z,
        "rec_ll": rec_ll,
        "kl": kl,
        "matching_ll": pp.log_prob(z),
    }


def test_pm_vae_forward_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(5, 6), jnp.float32)
    b = jnp.asarray(rng.binomial(1, 0.5, (5, 6)), jnp.float32)

    ref_params, ref_out = _ref_probe(_VAE_CONFIG, x, b)
    ours = _our_probe(_VAE_CONFIG, _map_params(ref_params), x, b)

    for k in ("z", "rec_ll", "kl", "matching_ll"):
        np.testing.assert_allclose(
            np.asarray(ours[k]), np.asarray(ref_out[k]),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )


def _tril_permutation(k):
    """perm[my_slot] = ref_slot such that our row-major fill of
    raw[perm] equals tfp's fill_triangular of raw."""
    from tensorflow_probability.substrates.jax import bijectors as shim_b

    m = k * (k + 1) // 2
    # where does tfp put slot s?
    tfp_pos = {}
    for s in range(m):
        e = np.zeros(m, np.float32)
        e[s] = 1.0
        mat = np.asarray(shim_b._fill_triangular(jnp.asarray(e)))
        (i,), (j,) = np.nonzero(mat)
        tfp_pos[(int(i), int(j))] = s
    rows, cols = np.tril_indices(k)
    return np.array(
        [tfp_pos[(int(i), int(j))] for i, j in zip(rows, cols)]
    )


def test_pm_vae_tril_posterior_matches_reference():
    """TriL posterior head: reference raw params pack via tfp's
    fill_triangular; ours pack row-major. Permuting the head Linear's output
    columns converts one checkpoint to the other exactly."""
    cfg = dict(_VAE_CONFIG)
    cfg["posterior_dist"] = "TriLGaussian"
    # reference from_config shares posterior config with the partial head
    latent = cfg["latent_dim"]

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 6), jnp.float32)
    b = jnp.asarray(rng.binomial(1, 0.5, (4, 6)), jnp.float32)

    ref_params, ref_out = _ref_probe(cfg, x, b)
    mapped = _map_params(ref_params)

    perm = _tril_permutation(latent)
    for head in ("posterior_dist", "partial_posterior_dist"):
        dense = mapped[head]["Dense_0"]
        w, bias = dense["kernel"].copy(), dense["bias"].copy()
        w[:, latent:] = w[:, latent:][:, perm]
        bias[latent:] = bias[latent:][perm]
        dense["kernel"], dense["bias"] = w, bias

    ours = _our_probe(cfg, mapped, x, b)
    for k in ("z", "rec_ll", "kl", "matching_ll"):
        np.testing.assert_allclose(
            np.asarray(ours[k]), np.asarray(ref_out[k]),
            rtol=1e-4, atol=1e-4, err_msg=k,
        )
