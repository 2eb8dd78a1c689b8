"""Train state + checkpoint contract.

``TrainState`` keeps the reference's checkpoint field names (``.params``,
``.state``, ``.ema_params`` — see reference train_pm_vdvae.py:66 and the bax
TrainState referenced throughout) so run directories produced by our
``train_*.py`` scripts are consumed by our ``eval_*.py`` scripts via the same
``runs/<id>/{train_state.pkl, model_config.json}`` contract
(reference train_pm_vae.py:91,108-109).
"""
from __future__ import annotations

import pickle
from dataclasses import dataclass
from typing import Any, Optional

import jax
import numpy as np


@dataclass
class TrainState:
    params: Any
    state: Any
    opt_state: Any = None
    ema_params: Any = None
    step: Any = 0


jax.tree_util.register_dataclass(
    TrainState,
    data_fields=["params", "state", "opt_state", "ema_params", "step"],
    meta_fields=[],
)


def to_host(tree):
    """Device -> host numpy for the whole pytree (for pickling)."""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_train_state(path: str, train_state: TrainState):
    host_state = TrainState(
        params=to_host(train_state.params),
        state=to_host(train_state.state),
        opt_state=to_host(train_state.opt_state),
        ema_params=to_host(train_state.ema_params),
        step=int(train_state.step),
    )
    with open(path, "wb") as fp:
        pickle.dump(host_state, fp)


def load_train_state(path: str) -> TrainState:
    with open(path, "rb") as fp:
        return pickle.load(fp)
