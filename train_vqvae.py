"""Trains a plain VQ-VAE (stage 1 of the PM-VQVAE pipeline).

Drop-in equivalent of the reference's ``train_vqvae.py`` (same CLI and
artifact layout). The EMA codebook statistics live in a flax ``vq_ema``
variable collection threaded through the trainer's mutable state.
"""
import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from absl import app, flags
from ml_collections.config_flags import config_flags

from posterior_matching_tpu.runtime import configure_environment

configure_environment()

from posterior_matching_tpu.data import load_datasets
from posterior_matching_tpu.models.vqvae import VQVAE
from posterior_matching_tpu.train import (
    Callback,
    CheckpointCallback,
    TensorBoardCallback,
    Trainer,
)
from posterior_matching_tpu.utils import make_run_dir

from posterior_matching_tpu.train.resume import (
    define_resume_flag,
    resolve_seed,
    resume_state_from_flag,
    save_train_meta,
)

config_flags.DEFINE_config_file("config", lock_config=False)
define_resume_flag()


class ReconstructionCallback(Callback):
    """Logs [x | reconstruction] strips at validation time (reference
    train_vqvae.py:32-55)."""

    def __init__(self, model: VQVAE, dataset, num_examples: int = 3):
        self._model = model
        batch = next(iter(dataset))
        self._images = jnp.asarray(batch["image"][:num_examples])
        self._fn = jax.jit(self._reconstruct)

    def _reconstruct(self, params, state, images):
        out = self._model.apply(
            {"params": params, **state}, images, is_training=False
        )
        return jnp.clip(out["reconstruction"], 0.0, 1.0)

    def on_validation_end(self, train_state, step, logs):
        recon = np.asarray(
            self._fn(train_state.params, train_state.state, self._images)
        )
        x = np.broadcast_to(np.asarray(self._images), recon.shape)
        strips = np.concatenate([x, recon], axis=2)
        assert np.all((strips >= 0.0) & (strips <= 1.0))
        logs["reconstructions"] = strips


def main(_):
    config = flags.FLAGS.config

    config.seed = resolve_seed(config)

    config.lock()

    train_dataset, val_dataset = load_datasets(config.data)
    if config.get("device_resident_data", False):
        # HBM-resident training data + on-device batch gather; pair
        # with config.steps_per_call to remove the host input path.
        train_dataset = train_dataset.to_device_resident()

    model = VQVAE(**config.model.to_dict())

    def loss_fn(params, state, key, step, batch, is_training):
        out, new_state = model.apply(
            {"params": params, **state},
            batch["image"],
            is_training=is_training,
            mutable=["vq_ema"],
        )
        if not is_training:
            new_state = state  # EMA only advances on train steps
        aux = {
            "perplexity": jnp.mean(out["vq_output"]["perplexity"]),
            "reconstruction_loss": jnp.mean(out["reconstruction_loss"]),
            "vq_loss": jnp.mean(out["vq_output"]["loss"]),
        }
        return out["loss"], aux, new_state

    def init_fn(key, batch):
        variables = model.init(key, batch["image"], is_training=True)
        params = variables.pop("params")
        return params, dict(variables)

    trainer = Trainer(
        loss_fn,
        init_fn,
        optax.adam(config.learning_rate),
        num_devices=1,
        seed=config.seed,
        steps_per_call=config.get("steps_per_call", 1),
    )

    run_dir = make_run_dir(prefix=f"vqvae-{config.data.dataset}")
    print("Using run directory:", run_dir)
    save_train_meta(run_dir, config)

    with open(os.path.join(run_dir, "model_config.json"), "w") as fp:
        json.dump(config.model.to_dict(), fp)

    callbacks = [
        CheckpointCallback(os.path.join(run_dir, "train_state.pkl")),
        ReconstructionCallback(model, val_dataset),
        TensorBoardCallback(os.path.join(run_dir, "tb")),
    ]

    trainer.fit(
        train_dataset,
        config.steps,
        resume_from=resume_state_from_flag(),
        val_dataset=val_dataset,
        validation_freq=config.validation_freq,
        callbacks=callbacks,
    )


if __name__ == "__main__":
    app.run(main)
