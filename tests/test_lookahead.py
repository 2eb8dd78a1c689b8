"""Lookahead posterior + acquisition engine tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posterior_matching_tpu.acquisition import (
    make_acquisition_eval_fn,
    make_collect_trajectory_fn,
    rmse,
)
from posterior_matching_tpu.models.lookahead import LookaheadPosterior

PM_VAE_CONFIG = {
    "latent_dim": 3,
    "encoder_net": "ResidualMLP",
    "decoder_net": "ResidualMLP",
    "decoder_dist": "IdentityGaussian",
    "posterior_dist": "TriLGaussian",
    "decoder_dist_config": {"event_size": 6},
    "encoder_net_config": {"residual_blocks": 1, "hidden_units": 16},
    "decoder_net_config": {"residual_blocks": 1, "hidden_units": 16},
}

LOOKAHEAD_CONFIG = {
    "num_features": 6,
    "lookahead_subsample": 3,
    "model_samples": 4,
}


@pytest.fixture(scope="module")
def model_and_vars():
    model = LookaheadPosterior.from_config(LOOKAHEAD_CONFIG, PM_VAE_CONFIG)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 6), jnp.float32)
    b = jnp.asarray(rng.binomial(1, 0.5, (4, 6)), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    v_call = model.init(rngs, x, b)
    # __call__ never touches the pm_vae's full encoder; in the real pipeline
    # those params arrive via the warm start from the PM-VAE checkpoint
    # (train_lookahead_posterior.py initial_params). Merge an info-gain-path
    # init to stand in for that here.
    v_gains = model.init(rngs, x[0], b[0], method=model.expected_info_gains)

    def merge(a, b):
        out = dict(a)
        for k, v in b.items():
            out[k] = merge(out[k], v) if isinstance(out.get(k), dict) else v
        return out

    variables = {"params": merge(dict(v_gains["params"]), dict(v_call["params"]))}
    return model, variables, x, b


def test_param_layout_for_freeze_and_warm_start(model_and_vars):
    model, variables, x, b = model_and_vars
    params = variables["params"]
    assert "pm_vae" in params  # warm-start target
    assert any("lookahead" in k for k in params)  # freeze predicate target


def test_training_lls(model_and_vars):
    model, variables, x, b = model_and_vars
    lls = model.apply(
        variables, x, b, rngs={"sample": jax.random.PRNGKey(2)}
    )
    assert lls.shape == (4,)
    assert np.isfinite(np.asarray(lls)).all()


def test_training_gradient_only_lookahead(model_and_vars):
    model, variables, x, b = model_and_vars

    def loss(params):
        lls = model.apply(
            {"params": params}, x, b, rngs={"sample": jax.random.PRNGKey(3)}
        )
        return -jnp.mean(lls)

    g = jax.grad(loss)(variables["params"])
    look = sum(
        float(np.abs(np.asarray(v)).sum())
        for k in g if "lookahead" in k
        for v in jax.tree.leaves(g[k])
    )
    assert look > 0.0


def test_expected_info_gains(model_and_vars):
    model, variables, x, b = model_and_vars
    gains = model.apply(
        variables, x[0], b[0], method=model.expected_info_gains
    )
    assert gains.shape == (6,)
    g = np.asarray(gains)
    m = np.asarray(b[0])
    assert (g[m == 1] == -np.inf).all()
    assert np.isfinite(g[m == 0]).all()


def test_rmse():
    true = jnp.asarray([1.0, 2.0, 3.0])
    pred = jnp.asarray([1.0, 0.0, 3.0])
    b = jnp.asarray([1.0, 0.0, 1.0])
    np.testing.assert_allclose(
        float(rmse(true, pred, b)), np.sqrt(4.0 / 3.0), rtol=1e-6
    )


def test_acquisition_trajectory(model_and_vars):
    model, variables, x, b = model_and_vars
    eval_fn = make_acquisition_eval_fn(model, variables, num_samples=4)
    collect = jax.jit(make_collect_trajectory_fn(eval_fn, episode_length=3))
    sampling_traj, look_traj = collect(x[0], jax.random.PRNGKey(4))

    for traj in (sampling_traj, look_traj):
        assert traj["mask"].shape == (3, 6)
        assert traj["rmse"].shape == (3,)
        assert traj["reconstruction"].shape == (3, 6)
        assert traj["sampling_probs"].shape == (3, 6)
        masks = np.asarray(traj["mask"])
        # masks start empty and grow by exactly one feature per step
        np.testing.assert_array_equal(masks[0], 0)
        assert masks[1].sum() == 1
        assert masks[2].sum() == 2

    # the two strategies follow their own actions
    a1 = np.asarray(sampling_traj["sampling_action"])
    masks = np.asarray(sampling_traj["mask"])
    assert masks[1][a1[0]] == 1
    a2 = np.asarray(look_traj["lookahead_action"])
    masks2 = np.asarray(look_traj["mask"])
    assert masks2[1][a2[0]] == 1
