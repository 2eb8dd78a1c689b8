"""Trainer callbacks (reference bax callbacks + utils.py:139-151)."""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import numpy as np

from posterior_matching_tpu.train.state import TrainState, save_train_state


class Callback:
    """Validation-time hooks, same surface as bax's Callback
    (reference clustering.py:53-72 shows both hooks in use)."""

    def on_validation_step(self, train_state: TrainState, key, batch):
        pass

    def on_validation_end(
        self, train_state: TrainState, step: int, logs: Dict[str, Any]
    ):
        pass


class CheckpointCallback(Callback):
    """Pickles the TrainState every validation (reference
    train_pm_vae.py:91)."""

    def __init__(self, path: str):
        self._path = path

    def on_validation_end(self, train_state, step, logs):
        save_train_state(self._path, train_state)


class LearningRateLoggerCallback(Callback):
    def __init__(self, schedule: Callable):
        self._schedule = schedule

    def on_validation_end(self, train_state, step, logs):
        logs["learning_rate"] = float(np.asarray(self._schedule(step)))


class TensorBoardCallback(Callback):
    """Scalars + images to TensorBoard via tensorboardX
    (reference utils.py:139-151 writes via tf.summary; same routing rule:
    ndim 0 -> scalar, otherwise image batch)."""

    def __init__(self, path: str):
        from tensorboardX import SummaryWriter

        self._writer = SummaryWriter(path)

    def on_validation_end(self, train_state, step, logs):
        for k, v in logs.items():
            v = np.asarray(jax.device_get(v))
            if v.ndim == 0:
                self._writer.add_scalar(k, float(v), global_step=step)
            else:
                # [B, H, W, C] in [0, 1]
                imgs = np.clip(v, 0.0, 1.0)
                self._writer.add_images(
                    k, imgs, global_step=step, dataformats="NHWC"
                )
        self._writer.flush()


class OrbaxCheckpointCallback(Callback):
    """Orbax-managed checkpointing (atomic, async, retention-managed) as a
    production alternative to the reference's whole-state pickling. The pickle
    contract (CheckpointCallback) remains the cross-stage ABI; this adds
    durable mid-run snapshots for resume.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        import os

        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._manager = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def on_validation_end(self, train_state, step, logs):
        tree = {
            "params": train_state.params,
            "state": train_state.state,
            "opt_state": train_state.opt_state,
            "ema_params": train_state.ema_params,
            "step": step,
        }
        self._manager.save(
            step, args=self._ocp.args.StandardSave(tree)
        )

    def restore_latest(self):
        """Returns the newest checkpoint tree, or None."""
        step = self._manager.latest_step()
        if step is None:
            return None
        return self._manager.restore(step)
