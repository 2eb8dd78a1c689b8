"""Trains lookahead posteriors on a frozen PM-VAE.

Drop-in equivalent of the reference's ``train_lookahead_posterior.py``:
derives ``num_features`` from the mask shape, freezes everything except the
lookahead modules (reference train_lookahead_posterior.py:62-63), and
warm-starts the PM-VAE subtree from ``config.pm_vae_dir``.
"""
import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
from absl import app, flags
from ml_collections.config_flags import config_flags

from posterior_matching_tpu.runtime import configure_environment

configure_environment()

from posterior_matching_tpu.data import (
    load_datasets,
    make_prologue,
    make_val_prologue,
)
from posterior_matching_tpu.models.lookahead import LookaheadPosterior
from posterior_matching_tpu.train import (
    CheckpointCallback,
    LearningRateLoggerCallback,
    TensorBoardCallback,
    Trainer,
    load_train_state,
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


def main(_):
    config = flags.FLAGS.config

    config.seed = resolve_seed(config)

    train_dataset, val_dataset = load_datasets(config.data)
    if config.get("device_resident_data", False):
        # HBM-resident training data + on-device batch gather; pair
        # with config.steps_per_call to remove the host input path.
        train_dataset = train_dataset.to_device_resident()
    data_key = "image" if "image" in train_dataset.element_spec else "features"

    with open(os.path.join(config.pm_vae_dir, "model_config.json")) as fp:
        pm_vae_config = json.load(fp)
    pm_vae_state = load_train_state(
        os.path.join(config.pm_vae_dir, "train_state.pkl")
    )

    spec = train_dataset.element_spec[data_key]
    feature_dims = spec[0][1:]
    if data_key == "image":
        feature_dims = (*feature_dims[:-1], 1)  # masks are [H, W, 1]
    config.model.num_features = math.prod(feature_dims)
    config.lock()

    model = LookaheadPosterior.from_config(
        config.model.to_dict(), pm_vae_config
    )

    def loss_fn(params, state, key, step, batch, is_training):
        k_sample, k_dropout = jax.random.split(key)
        lls = model.apply(
            {"params": params},
            batch[data_key],
            batch["mask"],
            is_training=is_training,
            rngs={"sample": k_sample, "dropout": k_dropout},
        )
        return -jnp.mean(lls), {}, state

    def init_fn(key, batch):
        k1, k2 = jax.random.split(key)
        variables = model.init(
            {"params": k1, "sample": k2, "dropout": k2},
            batch[data_key],
            batch["mask"],
        )
        return variables["params"], {}

    schedule = optax.exponential_decay(**config.lr_schedule)
    optimizer = optax.chain(
        optax.scale_by_adam(**config.get("adam", {})),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    )

    def trainable_predicate(module_name, name, value):
        return "lookahead" in module_name

    trainer = Trainer(
        loss_fn,
        init_fn,
        optimizer,
        trainable_predicate=trainable_predicate,
        num_devices=1,
        seed=config.seed,
        steps_per_call=config.get("steps_per_call", 1),
        prologue_fn=make_prologue(config.data.to_dict()),
        val_prologue_fn=make_val_prologue(config.data.to_dict()),
    )

    run_dir = make_run_dir(prefix=f"lookahead-{config.data.dataset}")
    print("Using run directory:", run_dir)
    save_train_meta(run_dir, config)

    with open(os.path.join(run_dir, "lookahead_config.json"), "w") as fp:
        json.dump(config.model.to_dict(), fp)
    with open(os.path.join(run_dir, "pm_vae_config.json"), "w") as fp:
        json.dump(pm_vae_config, fp)

    callbacks = [
        CheckpointCallback(os.path.join(run_dir, "train_state.pkl")),
        LearningRateLoggerCallback(schedule),
        TensorBoardCallback(os.path.join(run_dir, "tb")),
    ]

    trainer.fit(
        train_dataset,
        config.steps,
        resume_from=resume_state_from_flag(),
        val_dataset=val_dataset,
        validation_freq=config.validation_freq,
        callbacks=callbacks,
        initial_params={"pm_vae": pm_vae_state.params},
    )


if __name__ == "__main__":
    app.run(main)
