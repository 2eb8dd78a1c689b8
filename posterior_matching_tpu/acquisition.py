"""Greedy active-feature-acquisition engine.

TPU-native reimplementation of reference
``posterior_matching/acquisition.py``: per-step expected info gains from both
the sampling estimator and the lookahead posteriors drive two greedy
acquisition rollouts collected with ``lax.scan``. The rollout composes
``model.apply`` closures, so the whole episode jits into one XLA program.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from posterior_matching_tpu.models.lookahead import LookaheadPosterior


def rmse(true: jnp.ndarray, pred: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """RMSE over unobserved entries (reference acquisition.py:13-15)."""
    se = (true - pred) ** 2 * (1.0 - b)
    return jnp.sqrt(jnp.mean(se))


def make_acquisition_eval_fn(
    model: LookaheadPosterior,
    variables,
    num_samples: int,
) -> Callable[..., Dict[str, jnp.ndarray]]:
    """Single-instance eval fn: sampling + lookahead greedy actions, action
    distributions, and a mean-imputation reconstruction
    (reference acquisition.py:18-65)."""

    def eval_fn(x_o, b, key) -> Dict[str, jnp.ndarray]:
        k_sampling, k_impute = jax.random.split(key)
        sampling_gains = model.apply(
            variables, x_o, b, num_samples,
            method=model.sampling_info_gains, rngs={"sample": k_sampling},
        )
        lookahead_gains = model.apply(
            variables, x_o, b, method=model.expected_info_gains
        )

        sampling_logits = jnp.where(
            sampling_gains == -jnp.inf, -1e10, sampling_gains
        )
        lookahead_logits = jnp.where(
            lookahead_gains == -jnp.inf, -1e10, lookahead_gains
        )

        imputations = model.apply(
            variables,
            jnp.expand_dims(x_o, 0),
            jnp.expand_dims(b, 0),
            num_samples,
            method=model.impute,
            rngs={"sample": k_impute},
        )
        reconstruction = jnp.squeeze(jnp.mean(imputations, axis=0), 0)

        return {
            "sampling_action": jnp.argmax(sampling_logits),
            "lookahead_action": jnp.argmax(lookahead_logits),
            "sampling_probs": jax.nn.softmax(sampling_logits),
            "lookahead_probs": jax.nn.softmax(lookahead_logits),
            "reconstruction": reconstruction,
        }

    return eval_fn


def make_collect_trajectory_fn(
    eval_fn: Callable[..., Dict[str, jnp.ndarray]],
    episode_length: int,
) -> Callable[[jnp.ndarray, jax.Array], Tuple[Dict, Dict]]:
    """Greedy acquisition simulator: two ``episode_length``-step rollouts per
    instance, one per action strategy (reference acquisition.py:68-127)."""

    def collect_trajectory(x: jnp.ndarray, key: jax.Array):
        num_features = math.prod(x.shape)

        def make_step(action_key: str):
            def step(carry, k):
                cur_b = carry
                x_o = x * cur_b
                data = eval_fn(x_o, cur_b, k)
                new_b = cur_b + jnp.reshape(
                    jax.nn.one_hot(data[action_key], num_features),
                    cur_b.shape,
                )
                data["rmse"] = rmse(x, data["reconstruction"], cur_b)
                data["mask"] = cur_b
                return new_b, data

            return step

        k1, k2 = jax.random.split(key)
        _, sampling_data = jax.lax.scan(
            make_step("sampling_action"),
            jnp.zeros_like(x),
            jax.random.split(k1, episode_length),
        )
        _, lookahead_data = jax.lax.scan(
            make_step("lookahead_action"),
            jnp.zeros_like(x),
            jax.random.split(k2, episode_length),
        )
        return sampling_data, lookahead_data

    return collect_trajectory
