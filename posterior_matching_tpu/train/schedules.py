"""Optimization schedules (reference utils.py:124-136, train_pm_vae.py:28-43)."""
from __future__ import annotations

import jax.numpy as jnp
import optax


def cyclical_annealing_schedule(
    low_value: float, high_value: float, period: int, delay: int = 0
) -> optax.Schedule:
    """Cyclic beta warm-up: ramps low->high over the first half of each period
    (reference utils.py:124-136)."""

    def schedule(count):
        true_count = count
        count = count - delay
        count = jnp.clip(count % period, 0, period // 2)
        frac = 1 - count / (period // 2)
        x = (low_value - high_value) * frac + high_value
        x = x * (true_count >= delay)
        return x

    return schedule


def get_beta_schedule(config) -> optax.Schedule:
    """Beta schedule dispatch (reference train_pm_vae.py:28-43): none /
    monotonic / cyclic."""
    cfg = dict(config or {})
    if "schedule" not in cfg:
        return lambda _: 1.0
    if cfg["schedule"] == "monotonic":
        return optax.linear_schedule(
            cfg["low_value"],
            cfg["high_value"],
            cfg["transition_steps"],
            cfg["transition_begin"],
        )
    if cfg["schedule"] == "cyclic":
        return cyclical_annealing_schedule(
            cfg["low_value"], cfg["high_value"], cfg["period"], cfg["delay"]
        )
    raise ValueError(f"unknown beta schedule: {cfg['schedule']}")
