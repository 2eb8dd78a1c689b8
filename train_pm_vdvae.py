"""Trains a Posterior Matching VDVAE (the multi-chip training workload).

Drop-in equivalent of the reference's ``train_pm_vdvae.py``: loss =
-ELBO + mean(pm_kl), bpd logging, gradient clipping, EMA params used for
eval, non-finite update skipping. The reference pmap's over
``jax.local_device_count()`` with per-device batches
(reference train_pm_vdvae.py:146-154); here the step is jit-sharded over the
1-D data mesh and the global batch is ``config.data.train_batch_size *
num_devices`` (keeping the reference's per-device batch semantics,
reference configs/pm_vdvae_mnist.py:11-14).
"""
import json
import math
import os
import random

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
from posterior_matching_tpu.models.vdvae import (
    PosteriorMatchingVDVAE,
    vdvae_impute,
)
from posterior_matching_tpu.train import (
    Callback,
    CheckpointCallback,
    LearningRateLoggerCallback,
    TensorBoardCallback,
    Trainer,
    group_by_shape,
    stacked_shape_mask,
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
    """Logs reconstruction / imputation / unconditional-sample strips from the
    EMA params (reference train_pm_vdvae.py:34-97)."""

    def __init__(self, model, dataset, prologue, num_examples=8, seed=None):
        self._model = model
        batch = next(iter(dataset))
        self._batch = {"image": jnp.asarray(batch["image"][:num_examples])}
        self._prologue = prologue
        self._key = jax.random.PRNGKey(seed or random.randint(0, int(2e9)))
        self._fn = jax.jit(self._generate)

    def _generate(self, params, key):
        k_mask, k1, k2, k3 = jax.random.split(key, 4)
        batch = self._prologue(self._batch, k_mask)
        x, b = batch["image"], batch["mask"]
        variables = {"params": params}
        out = self._model.apply(
            variables, x, b, rngs={"sample": k1}
        )
        imputations = vdvae_impute(
            self._model, variables, x, b, k2, num_samples=8
        )
        samples = self._model.apply(
            variables, 8, method=self._model.sample, rngs={"sample": k3}
        )
        return out["reconstruction"], imputations, samples, b

    def on_validation_end(self, train_state, step, logs):
        self._key, k = jax.random.split(self._key)
        params = (
            train_state.ema_params
            if train_state.ema_params is not None
            else train_state.params
        )
        recon, imputations, samples, b = jax.device_get(
            self._fn(params, k)
        )
        x = np.asarray(self._batch["image"])
        x_o = np.where(np.asarray(b) == 1, x, 127.5)

        logs["reconstructions"] = (
            np.concatenate([x, recon], axis=2).astype(np.uint8) / 255.0
        )
        bsz, s, h, w, c = imputations.shape
        strip = imputations.transpose(0, 2, 1, 3, 4).reshape(bsz, h, s * w, c)
        logs["imputations"] = (
            np.concatenate([x, x_o, strip], axis=2).astype(np.uint8) / 255.0
        )
        logs["samples"] = np.asarray(samples).astype(np.uint8) / 255.0


def main(_):
    config = flags.FLAGS.config

    config.seed = resolve_seed(config)

    config.lock()

    num_devices = jax.local_device_count()
    data_config = dict(config.data.to_dict())
    # per-device batch sizes in the config (reference semantics)
    data_config["train_batch_size"] *= num_devices
    data_config["val_batch_size"] *= num_devices

    train_dataset, val_dataset = load_datasets(
        data_config, normalize_images=False
    )
    if config.get("device_resident_data", False):
        # HBM-resident training data + on-device batch gather; pair
        # with config.steps_per_call to remove the host input path.
        train_dataset = train_dataset.to_device_resident()

    model = PosteriorMatchingVDVAE.from_config(config.model.to_dict())
    image_dims = math.prod(config.model.image_shape)

    def loss_fn(params, state, key, step, batch, is_training):
        out = model.apply(
            {"params": params},
            batch["image"],
            batch["mask"],
            rngs={"sample": key},
        )
        elbo = jnp.mean(out["reconstruction_ll"] - out["kl"])
        loss = -elbo + jnp.mean(out["pm_kl"])
        aux = {
            "reconstruction_ll": jnp.mean(out["reconstruction_ll"]),
            "kl": jnp.mean(out["kl"]),
            "pm_kl": jnp.mean(out["pm_kl"]),
            "bpd": -elbo / (image_dims * np.log(2)),
        }
        return loss, aux, state

    def init_fn(key, batch):
        k1, k2 = jax.random.split(key)
        variables = model.init(
            {"params": k1, "sample": k2},
            batch["image"],
            batch["mask"],
        )
        return variables["params"], {}

    warm_up_steps = config.get("warm_up", 0)
    if warm_up_steps > 0:
        schedule = optax.linear_schedule(0.0, config.lr, warm_up_steps)
    else:
        schedule = lambda _: config.lr

    # flat_optimizer (config, default off — the optimizer-state pickle ABI
    # changes): consolidate clip+adam+wd+schedule over same-shape leaf
    # GROUPS (train/optim.py::group_by_shape — the VDVAE's ~hundreds of
    # leaves otherwise fragment the update into small kernels). The
    # reference's shape-dependent decay mask (ndim != 1) is evaluated on
    # each group's original shape via stacked_shape_mask — bit-identical
    # updates (tests/test_trainer.py).
    flat = bool(config.get("flat_optimizer", False))
    mask = (
        stacked_shape_mask()
        if flat
        else (lambda p: jax.tree.map(lambda x: x.ndim != 1, p))
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(config.gradient_clip),
        optax.scale_by_adam(**config.get("adam", {})),
        optax.add_decayed_weights(config.get("weight_decay", 0.0), mask=mask),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    )
    if flat:
        optimizer = group_by_shape(optimizer)

    trainer = Trainer(
        loss_fn,
        init_fn,
        optimizer,
        num_devices=num_devices,
        seed=config.seed,
        steps_per_call=config.get("steps_per_call", 1),
        skip_nonfinite_updates=True,
        ema_rate=config.get("ema_rate", 0.999),
        use_ema_for_eval=True,
        prologue_fn=make_prologue(data_config),
        val_prologue_fn=make_val_prologue(data_config),
    )

    run_dir = make_run_dir(prefix=f"pm-vdvae-{config.data.dataset}")
    print("Using run directory:", run_dir)
    save_train_meta(run_dir, config)

    with open(os.path.join(run_dir, "model_config.json"), "w") as fp:
        json.dump(config.model.to_dict(), fp)

    callbacks = [
        CheckpointCallback(os.path.join(run_dir, "train_state.pkl")),
        ReconstructionCallback(
            model, val_dataset, make_val_prologue(data_config)
        ),
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
    )


if __name__ == "__main__":
    app.run(main)
