"""Trains a Posterior Matching VAE.

Drop-in equivalent of the reference's ``train_pm_vae.py`` (same CLI:
``python train_pm_vae.py --config configs/pm_vae_gas.py``; same artifact
layout: ``runs/pm-vae-<dataset>-<ts>/{train_state.pkl, model_config.json}``),
rebuilt on the TPU-native stack: one jit-compiled sharded train step with
on-device mask generation and training noise.
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
from posterior_matching_tpu.models.vae import PosteriorMatchingVAE
from posterior_matching_tpu.train import (
    CheckpointCallback,
    LearningRateLoggerCallback,
    TensorBoardCallback,
    Trainer,
    get_beta_schedule,
    save_train_state,
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


def build_loss_fn(model, config, data_key):
    """The PM-VAE training loss exactly as the reference composes it
    (reference train_pm_vae.py:58-72: mean ELBO with the beta schedule +
    matching_coef * mean matching loss). Module-level so the single-step
    update-parity test (tests/test_reference_parity_update.py) exercises
    the REAL training loss, not a restatement."""
    beta_schedule = get_beta_schedule(
        config.beta.to_dict() if "beta" in config else {}
    )
    matching_coef = config.get("matching_coef", 1.0)

    def loss_fn(params, state, key, step, batch, is_training):
        k_sample, k_dropout = jax.random.split(key)
        out = model.apply(
            {"params": params},
            batch[data_key],
            batch["mask"],
            is_training=is_training,
            rngs={"sample": k_sample, "dropout": k_dropout},
        )
        beta = beta_schedule(step)
        elbo = jnp.mean(out["reconstruction_ll"] - beta * out["kl"])
        matching_loss = -jnp.mean(out["matching_ll"])
        loss = -elbo + matching_coef * matching_loss
        aux = {k: jnp.mean(v) for k, v in out.items()}
        aux["beta"] = beta
        return loss, aux, state

    return loss_fn


def build_optimizer(config):
    """The reference's exact optax chain (reference train_pm_vae.py:74-83):
    scale_by_adam -> add_decayed_weights(ndim != 1 mask) ->
    scale_by_schedule(exponential_decay) -> scale(-1)."""
    schedule = optax.exponential_decay(**config.lr_schedule)
    optimizer = optax.chain(
        optax.scale_by_adam(**config.get("adam", {})),
        optax.add_decayed_weights(
            config.get("weight_decay", 0.0),
            mask=lambda p: jax.tree.map(lambda x: x.ndim != 1, p),
        ),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    )
    return optimizer, schedule


def main(_):
    config = flags.FLAGS.config

    config.seed = resolve_seed(config)

    config.lock()

    train_dataset, val_dataset = load_datasets(config.data)
    if config.get("device_resident_data", False):
        # HBM-resident training data + on-device batch gather; pair
        # with config.steps_per_call to remove the host input path.
        train_dataset = train_dataset.to_device_resident()
    is_image_data = "image" in train_dataset.element_spec
    data_key = "image" if is_image_data else "features"

    model = PosteriorMatchingVAE.from_config(config.model.to_dict())
    loss_fn = build_loss_fn(model, config, data_key)

    def init_fn(key, batch):
        k_params, k_sample = jax.random.split(key)
        variables = model.init(
            {"params": k_params, "sample": k_sample, "dropout": k_sample},
            batch[data_key],
            batch["mask"],
            is_training=True,
        )
        return variables["params"], {}

    optimizer, schedule = build_optimizer(config)

    trainer = Trainer(
        loss_fn,
        init_fn,
        optimizer,
        num_devices=1,
        seed=config.seed,
        steps_per_call=config.get("steps_per_call", 1),
        prologue_fn=make_prologue(config.data),
        val_prologue_fn=make_val_prologue(config.data),
    )

    run_dir = make_run_dir(prefix=f"pm-vae-{config.data.dataset}")
    print("Using run directory:", run_dir)
    save_train_meta(run_dir, config)

    callbacks = [
        CheckpointCallback(os.path.join(run_dir, "train_state.pkl")),
        LearningRateLoggerCallback(schedule),
        TensorBoardCallback(os.path.join(run_dir, "tb")),
    ]

    train_state = trainer.fit(
        train_dataset,
        config.steps,
        resume_from=resume_state_from_flag(),
        val_dataset=val_dataset,
        validation_freq=config.validation_freq,
        callbacks=callbacks,
    )

    if config.get("save_final_state", False):
        save_train_state(os.path.join(run_dir, "train_state.pkl"), train_state)

    with open(os.path.join(run_dir, "model_config.json"), "w") as fp:
        json.dump(config.model.to_dict(), fp)


if __name__ == "__main__":
    app.run(main)
