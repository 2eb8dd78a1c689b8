"""Trains the partial encoder of a PM-VaDE on a frozen, pretrained VaDE.

Drop-in equivalent of the reference's ``train_pm_vade.py``: forces the
UniformMaskGenerator (reference train_pm_vade.py:32), trains
``-E[posterior_matching_ll]`` with only ``partial_*`` modules trainable
(reference train_pm_vade.py:56-57), warm-started from ``config.vade_dir``.
"""
import json
import os

import jax
import jax.numpy as jnp
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
from posterior_matching_tpu.models.vade import PosteriorMatchingVADE
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

    config.data.mask_generator = "UniformMaskGenerator"
    config.lock()

    train_dataset, val_dataset = load_datasets(config.data)
    if config.get("device_resident_data", False):
        # HBM-resident training data + on-device batch gather; pair
        # with config.steps_per_call to remove the host input path.
        train_dataset = train_dataset.to_device_resident()
    data_key = "image" if "image" in train_dataset.element_spec else "features"

    model = PosteriorMatchingVADE.from_config(config.model.to_dict())

    def loss_fn(params, state, key, step, batch, is_training):
        k_sample, k_dropout = jax.random.split(key)
        ll = model.apply(
            {"params": params},
            batch[data_key],
            batch["mask"],
            method=model.posterior_matching_ll,
            rngs={"sample": k_sample, "dropout": k_dropout},
        )
        return -jnp.mean(ll), {}, state

    def init_fn(key, batch):
        k1, k2 = jax.random.split(key)
        variables = model.init(
            {"params": k1, "sample": k2, "dropout": k2},
            batch[data_key],
            batch["mask"],
            method=model.posterior_matching_ll,
        )
        return variables["params"], {}

    vade_state = load_train_state(
        os.path.join(config.vade_dir, "train_state.pkl")
    )

    schedule = optax.exponential_decay(**config.lr_schedule)
    optimizer = optax.chain(
        optax.scale_by_adam(**config.get("adam", {})),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    )

    def trainable_predicate(module_name, name, value):
        # only the partial encoder learns (reference train_pm_vade.py:56-57)
        return "partial_" in module_name

    trainer = Trainer(
        loss_fn,
        init_fn,
        optimizer,
        num_devices=1,
        trainable_predicate=trainable_predicate,
        seed=config.seed,
        steps_per_call=config.get("steps_per_call", 1),
        prologue_fn=make_prologue(config.data.to_dict()),
        val_prologue_fn=make_val_prologue(config.data.to_dict()),
    )

    run_dir = make_run_dir(prefix=f"pm-vade-{config.data.dataset}")
    print("Using run directory:", run_dir)
    save_train_meta(run_dir, config)

    callbacks = [
        CheckpointCallback(os.path.join(run_dir, "train_state.pkl")),
        LearningRateLoggerCallback(schedule),
        TensorBoardCallback(os.path.join(run_dir, "tb")),
    ]

    with open(os.path.join(run_dir, "model_config.json"), "w") as fp:
        json.dump(config.model.to_dict(), fp)

    print("Starting main training...")
    trainer.fit(
        train_dataset,
        config.steps,
        resume_from=resume_state_from_flag(),
        val_dataset=val_dataset,
        validation_freq=config.validation_freq,
        callbacks=callbacks,
        initial_params=vade_state.params,
        initial_state=vade_state.state,
    )


if __name__ == "__main__":
    app.run(main)
