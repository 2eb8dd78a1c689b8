"""VaDE / PM-VaDE tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posterior_matching_tpu.models.vade import VADE, PosteriorMatchingVADE

CONFIG = {
    "encoder_net": "ResidualMLP",
    "decoder_net": "ResidualMLP",
    "decoder_dist": "IdentityGaussian",
    "decoder_dist_config": {"event_size": 6},
    "latent_dim": 3,
    "num_components": 4,
    "encoder_net_config": {"residual_blocks": 1, "hidden_units": 16},
    "decoder_net_config": {"residual_blocks": 1, "hidden_units": 16},
}

PM_CONFIG = dict(
    CONFIG,
    partial_posterior_dist="TriLGaussian",
    partial_posterior_dist_config={},
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 6), jnp.float32)
    b = jnp.asarray(rng.binomial(1, 0.5, (8, 6)), jnp.float32)
    return x, b


def test_elbo_and_gmm_params(data):
    x, _ = data
    model = VADE.from_config(CONFIG)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, method=model.elbo,
    )
    # GMM prior params live at the top level (graftable from sklearn fit)
    assert variables["params"]["logits"].shape == (4,)
    assert variables["params"]["mu"].shape == (4, 3)
    assert variables["params"]["log_scale"].shape == (4, 3)
    elbo = model.apply(
        variables, x, method=model.elbo,
        rngs={"sample": jax.random.PRNGKey(2)},
    )
    assert elbo.shape == (8,)
    assert np.isfinite(np.asarray(elbo)).all()


def test_predict_cluster_probs(data):
    x, _ = data
    model = VADE.from_config(CONFIG)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, method=model.elbo,
    )
    probs = model.apply(
        variables, x, 5, method=model.predict_cluster,
        rngs={"sample": jax.random.PRNGKey(3)},
    )
    assert probs.shape == (8, 4)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


def test_pretrain_loss(data):
    x, _ = data
    model = VADE.from_config(CONFIG)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, method=model.elbo,
    )
    loss = model.apply(variables, x, method=model.pretrain_loss)
    assert np.isfinite(float(loss))


def test_pm_vade_matching_and_partial_cluster(data):
    x, b = data
    model = PosteriorMatchingVADE.from_config(PM_CONFIG)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, b, method=model.posterior_matching_ll,
    )
    # partial modules present and named for the freeze predicate
    assert any("partial_" in k for k in variables["params"])
    ll = model.apply(
        variables, x, b, method=model.posterior_matching_ll,
        rngs={"sample": jax.random.PRNGKey(2)},
    )
    assert ll.shape == (8,)
    assert np.isfinite(np.asarray(ll)).all()

    probs = model.apply(
        variables, x, b, 5, method=model.partial_predict_cluster,
        rngs={"sample": jax.random.PRNGKey(3)},
    )
    assert probs.shape == (8, 4)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


def test_matching_gradient_only_partial(data):
    """posterior_matching_ll stops gradients on z: d(loss)/d(encoder) == 0."""
    x, b = data
    model = PosteriorMatchingVADE.from_config(PM_CONFIG)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, b, method=model.posterior_matching_ll,
    )

    def loss(params):
        ll = model.apply(
            {"params": params}, x, b, method=model.posterior_matching_ll,
            rngs={"sample": jax.random.PRNGKey(2)},
        )
        return -jnp.mean(ll)

    g = jax.grad(loss)(variables["params"])
    # encoder receives no gradient... note: the z sample path is stop-grad'd
    enc = sum(
        float(np.abs(np.asarray(v)).sum())
        for v in jax.tree.leaves(g["encoder_net"])
    )
    partial = sum(
        float(np.abs(np.asarray(v)).sum())
        for v in jax.tree.leaves(g["partial_encoder_net"])
    )
    assert enc == 0.0
    assert partial > 0.0


def test_elbo_vs_manual_mixture_bound(data):
    """Sanity: with a single component the VaDE ELBO reduces to the plain VAE
    ELBO with an MVN prior at (mu, exp(log_scale))."""
    x, _ = data
    cfg = dict(CONFIG, num_components=1)
    model = VADE.from_config(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, method=model.elbo,
    )
    elbo = model.apply(
        variables, x, method=model.elbo,
        rngs={"sample": jax.random.PRNGKey(5)},
    )

    from posterior_matching_tpu.distributions import MultivariateNormalDiag
    from posterior_matching_tpu.utils import sum_over_event

    def manual(mdl, x):
        posterior = mdl.encode(x)
        z = posterior.sample(mdl.make_rng("sample"))
        prior = MultivariateNormalDiag(
            loc=mdl.gmm_mu[0], scale_diag=jnp.exp(mdl.gmm_log_scale[0])
        )
        return (
            mdl.decode_log_prob(z, x)
            + prior.log_prob(z)
            - posterior.log_prob(z)
        )

    want = model.apply(
        variables, x, method=manual, rngs={"sample": jax.random.PRNGKey(5)}
    )
    np.testing.assert_allclose(np.asarray(elbo), np.asarray(want), rtol=1e-4)
