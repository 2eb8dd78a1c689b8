"""Trains the PM-VQVAE stage 2: conditional PixelCNN posterior + partial
encoder on a frozen, pretrained VQ-VAE.

Drop-in equivalent of the reference's ``train_pm_vqvae.py``: loads
``model_config.json`` + ``train_state.pkl`` from ``config.vqvae_dir``,
freezes everything under the ``vqvae`` param subtree (reference
trainable_predicate, train_pm_vqvae.py:122-123), warm-starts from the VQ-VAE
checkpoint, and trains ``-E[log p(codes | cond)]`` with on-device masks.
"""
import json
import os
import random
from typing import Any, Dict

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
from posterior_matching_tpu.models.pm_vqvae import PMVQVAE, pm_vqvae_impute
from posterior_matching_tpu.train import (
    Callback,
    CheckpointCallback,
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


class ImputationCallback(Callback):
    """Logs [x | x_o | imputations...] strips (reference
    train_pm_vqvae.py:34-61)."""

    def __init__(self, model: PMVQVAE, dataset, prologue, num_examples=3,
                 num_samples=5, seed=None):
        self._model = model
        batch = next(iter(dataset))
        self._batch = {"image": jnp.asarray(batch["image"][:num_examples])}
        self._prologue = prologue
        self._num_samples = num_samples
        self._key = jax.random.PRNGKey(seed or random.randint(0, int(2e9)))
        self._fn = jax.jit(self._impute)

    def _impute(self, params, state, key):
        k_mask, k_sample = jax.random.split(key)
        batch = self._prologue(self._batch, k_mask)
        variables = {"params": params, **state}
        imputations = pm_vqvae_impute(
            self._model, variables, batch["image"], batch["mask"],
            k_sample, num_samples=self._num_samples,
        )
        return imputations, batch["mask"]

    def on_validation_end(self, train_state, step, logs):
        self._key, k = jax.random.split(self._key)
        imputations, mask = self._fn(train_state.params, train_state.state, k)
        imputations = np.asarray(imputations)
        assert np.all((imputations >= 0.0) & (imputations <= 1.0))
        x = np.asarray(self._batch["image"])
        x_o = np.where(np.asarray(mask) == 1, x, 0.5)
        b, s, h, w, c = imputations.shape
        strip = imputations.transpose(0, 2, 1, 3, 4).reshape(b, h, s * w, c)
        logs["imputations"] = np.concatenate([x, x_o, strip], axis=2)


def main(_):
    config = flags.FLAGS.config

    config.seed = resolve_seed(config)

    train_dataset, val_dataset = load_datasets(config.data)
    if config.get("device_resident_data", False):
        # HBM-resident training data + on-device batch gather; pair
        # with config.steps_per_call to remove the host input path.
        train_dataset = train_dataset.to_device_resident()

    with open(os.path.join(config.vqvae_dir, "model_config.json")) as fp:
        vqvae_config = json.load(fp)
    vqvae_state = load_train_state(
        os.path.join(config.vqvae_dir, "train_state.pkl")
    )

    config.pixel_cnn.num_indices = vqvae_config["num_embeddings"]
    config.lock()

    model = PMVQVAE.from_config(
        config.conditional_dim,
        vqvae_config,
        config.pixel_cnn.to_dict(),
        compute_dtype=config.get("compute_dtype", None),
    )

    # packed_chain (None = auto: on when the TPU fused-chain kernels run):
    # train with the PixelCNN chain weights in kernel-native stacked form —
    # the optimizer sees ~26 stacked tensors instead of ~100 per-level
    # leaves and the per-step kernel-form derivation copies vanish.
    # Checkpoints/eval stay canonical (the codec en/decodes inside each
    # dispatch); exact for elementwise optimizers (tests/test_packed_chain).
    use_packed = config.get("packed_chain", None)
    if use_packed is None:
        use_packed = (
            jax.default_backend() == "tpu"
            and os.environ.get("PM_TPU_FUSED_CHAIN") != "0"
            and config.pixel_cnn.num_hierarchies == 1
        )
    codec_cell = []

    def codec_factory(init_params):
        from posterior_matching_tpu.models.pixelcnn import PackedChainCodec

        codec = PackedChainCodec(
            init_params,
            num_resnet=config.pixel_cnn.num_resnet,
            num_filters=config.pixel_cnn.num_filters,
            receptive_field_dims=tuple(
                config.pixel_cnn.get("receptive_field_dims", (3, 3))
            ),
        )
        codec_cell.append(codec)
        return codec

    def loss_fn(params, state, key, step, batch, is_training):
        packed = None
        if codec_cell and codec_cell[0].is_encoded(params):
            params, packed = codec_cell[0].split_encoded(params)
        ll, new_state = model.apply(
            {"params": params, **state},
            batch["image"],
            batch["mask"],
            training=is_training,
            rngs={"dropout": key},
            mutable=["vq_ema"],
            packed_chain=packed,
        )
        return -jnp.mean(ll), {}, state  # vqvae frozen: keep its EMA state

    def init_fn(key, batch):
        k1, k2 = jax.random.split(key)
        variables = model.init(
            {"params": k1, "dropout": k2},
            batch["image"],
            batch["mask"],
            training=True,
        )
        params = variables.pop("params")
        return params, dict(variables)

    schedule = optax.exponential_decay(**config.lr_schedule)
    optimizer = optax.chain(
        optax.scale_by_adam(**config.get("adam", {})),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    )

    def trainable_predicate(module_name, name, value):
        # freeze the pretrained VQ-VAE (reference train_pm_vqvae.py:122-123)
        return not module_name.startswith("vqvae")

    prologue = make_prologue(config.data)
    trainer = Trainer(
        loss_fn,
        init_fn,
        optimizer,
        trainable_predicate=trainable_predicate,
        num_devices=1,
        seed=config.seed,
        steps_per_call=config.get("steps_per_call", 1),
        prologue_fn=prologue,
        val_prologue_fn=make_val_prologue(config.data),
        param_codec=codec_factory if use_packed else None,
    )

    run_dir = make_run_dir(prefix=f"pm-vqvae-{config.data.dataset}")
    print("Using run directory:", run_dir)
    save_train_meta(run_dir, config)

    with open(os.path.join(run_dir, "config.json"), "w") as fp:
        json.dump(config.to_dict(), fp)
    with open(os.path.join(run_dir, "vqvae_config.json"), "w") as fp:
        json.dump(vqvae_config, fp)

    callbacks = [
        CheckpointCallback(os.path.join(run_dir, "train_state.pkl")),
        ImputationCallback(
            model, val_dataset, make_val_prologue(config.data)
        ),
        TensorBoardCallback(os.path.join(run_dir, "tb")),
    ]

    # Warm start: the standalone VQ-VAE checkpoint's trees sit under the
    # wrapper's 'vqvae' subtree (reference passes them directly because haiku
    # shares one flat namespace, train_pm_vqvae.py:154-155).
    trainer.fit(
        train_dataset,
        config.steps,
        resume_from=resume_state_from_flag(),
        val_dataset=val_dataset,
        validation_freq=config.validation_freq,
        callbacks=callbacks,
        initial_params={"vqvae": vqvae_state.params},
        initial_state={"vq_ema": {"vqvae": vqvae_state.state["vq_ema"]}},
    )


if __name__ == "__main__":
    app.run(main)
