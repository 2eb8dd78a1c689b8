"""PM-VAE model tests: shapes, loss finiteness, all public methods."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posterior_matching_tpu.models.vae import PosteriorMatchingVAE

UCI_CONFIG = {
    "latent_dim": 4,
    "encoder_net": "ResidualMLP",
    "decoder_net": "ResidualMLP",
    "decoder_dist": "IdentityGaussian",
    "posterior_dist": "TriLGaussian",
    "decoder_dist_config": {"event_size": 6},
    # the reference's UCI configs carry masked_posterior_dist keys that are
    # silently ignored (SURVEY quirk); verify we ignore them too
    "masked_posterior_dist": "AutoregressiveGMM",
    "masked_posterior_config": {"hidden_units": 32, "residual_blocks": 1},
    "encoder_net_config": {"residual_blocks": 1, "hidden_units": 32},
    "decoder_net_config": {"residual_blocks": 1, "hidden_units": 32},
    "matching_ll_stop_gradients": True,
}

AGMM_CONFIG = {
    "latent_dim": 3,
    "encoder_net": "ResidualMLP",
    "decoder_net": "ResidualMLP",
    "decoder_dist": "IdentityGaussian",
    "posterior_dist": "TriLGaussian",
    "partial_posterior_dist": "AutoregressiveGMM",
    "partial_posterior_dist_config": {
        "num_components": 4,
        "residual_blocks": 1,
        "hidden_units": 32,
    },
    "decoder_dist_config": {"event_size": 6},
    "encoder_net_config": {"residual_blocks": 1, "hidden_units": 32},
    "decoder_net_config": {"residual_blocks": 1, "hidden_units": 32},
}


def _init(config, b=8, d=6):
    model = PosteriorMatchingVAE.from_config(config)
    x = jnp.asarray(np.random.RandomState(0).randn(b, d), jnp.float32)
    mask = jnp.asarray(
        np.random.RandomState(1).binomial(1, 0.5, (b, d)), jnp.float32
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x,
        mask,
    )
    return model, variables, x, mask


def test_call_outputs():
    model, variables, x, mask = _init(UCI_CONFIG)
    out = model.apply(
        variables, x, mask, rngs={"sample": jax.random.PRNGKey(2)}
    )
    assert set(out) == {"reconstruction_ll", "kl", "matching_ll"}
    for v in out.values():
        assert v.shape == (8,)
        assert np.isfinite(np.asarray(v)).all()


def test_quirk_partial_posterior_falls_back_to_tril():
    """masked_posterior_dist keys must be ignored (reference vae.py:103-107
    only reads partial_posterior_dist*)."""
    model = PosteriorMatchingVAE.from_config(UCI_CONFIG)
    assert model.partial_posterior_dist == "TriLGaussian"


def test_impute_shapes_and_stitching():
    model, variables, x, mask = _init(UCI_CONFIG)
    imp = model.apply(
        variables,
        x,
        mask,
        num_samples=7,
        method=model.impute,
        rngs={"sample": jax.random.PRNGKey(3)},
    )
    assert imp.shape == (7, 8, 6)
    # observed entries must be passed through exactly
    xo = np.asarray(x * mask)
    for s in range(7):
        np.testing.assert_allclose(
            np.asarray(imp)[s][np.asarray(mask) == 1],
            xo[np.asarray(mask) == 1],
            rtol=1e-6,
        )


def test_is_log_prob():
    model, variables, x, mask = _init(UCI_CONFIG)
    log_px, log_pxu = model.apply(
        variables,
        x,
        mask,
        num_samples=16,
        method=model.is_log_prob,
        rngs={"sample": jax.random.PRNGKey(4)},
    )
    assert log_px.shape == (8,)
    assert log_pxu.shape == (8,)
    assert np.isfinite(np.asarray(log_px)).all()


def test_expected_info_gains():
    model, variables, x, mask = _init(UCI_CONFIG)
    gains = model.apply(
        variables,
        x[0],
        mask[0],
        num_samples=8,
        method=model.expected_info_gains,
        rngs={"sample": jax.random.PRNGKey(5)},
    )
    assert gains.shape == (6,)
    g = np.asarray(gains)
    m = np.asarray(mask[0])
    assert (g[m == 1] == -np.inf).all()
    assert np.isfinite(g[m == 0]).all()


def test_agmm_partial_posterior_paths():
    model, variables, x, mask = _init(AGMM_CONFIG)
    out = model.apply(
        variables, x, mask, rngs={"sample": jax.random.PRNGKey(6)}
    )
    assert np.isfinite(np.asarray(out["matching_ll"])).all()
    imp = model.apply(
        variables,
        x,
        mask,
        num_samples=3,
        method=model.impute,
        rngs={"sample": jax.random.PRNGKey(7)},
    )
    assert imp.shape == (3, 8, 6)
    assert np.isfinite(np.asarray(imp)).all()
    log_px, log_pxu = model.apply(
        variables,
        x,
        mask,
        num_samples=4,
        method=model.is_log_prob,
        rngs={"sample": jax.random.PRNGKey(8)},
    )
    assert np.isfinite(np.asarray(log_px)).all()


def test_agmm_log_prob_teacher_forcing_consistency():
    """AGMM log_prob computed via the single batched forward must equal a
    naive per-dimension evaluation."""
    from posterior_matching_tpu.models.heads import AutoregressiveGMMHead

    head = AutoregressiveGMMHead(
        event_size=3, num_components=2, residual_blocks=1, hidden_units=16
    )
    ctx = jnp.asarray(np.random.RandomState(0).randn(2, 5), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), ctx)
    dist = head.apply(variables, ctx)
    value = jnp.asarray(np.random.RandomState(1).randn(2, 3), jnp.float32)
    got = dist.log_prob(value)

    # naive: per-dim conditional evaluation
    from posterior_matching_tpu.models.heads import _agmm_net_out

    total = jnp.zeros(2)
    for i in range(3):
        m = (jnp.arange(3) < i).astype(jnp.float32)
        mask = jnp.broadcast_to(m, value.shape)
        gmm = _agmm_net_out(dist.net_params, value * mask, mask, ctx, 3, 2)
        total = total + gmm.log_prob(value)[:, i]
    np.testing.assert_allclose(got, total, rtol=1e-5)


def test_conv_image_model():
    config = {
        "latent_dim": 4,
        "encoder_net": "ConvEncoder",
        "decoder_net": "ConvDecoder",
        "posterior_dist": "TriLGaussian",
        "decoder_dist": "Bernoulli",
        "encoder_net_config": {
            "conv_layers": [(8, 3, 1), (8, 3, 2), (16, 3, 2), (16, 1, 1)]
        },
        "decoder_net_config": {
            "conv_layers": [
                (16, 8, 1),
                (16, 5, 2),
                (8, 5, 1),
                (8, 5, 1),
                (1, 3, 1),
            ]
        },
    }
    model = PosteriorMatchingVAE.from_config(config)
    x = jnp.asarray(
        np.random.RandomState(0).rand(4, 16, 16, 1), jnp.float32
    )
    b = jnp.asarray(
        np.random.RandomState(1).binomial(1, 0.8, (4, 16, 16, 1)), jnp.float32
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x,
        b,
    )
    out = model.apply(variables, x, b, rngs={"sample": jax.random.PRNGKey(2)})
    assert out["reconstruction_ll"].shape == (4,)
    assert np.isfinite(np.asarray(out["reconstruction_ll"])).all()
