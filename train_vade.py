"""Trains a VaDE model via the 3-phase pipeline.

Drop-in equivalent of the reference's ``train_vade.py``
(reference train_vade.py:34-159): (1) deterministic-autoencoder pretraining,
(2) sklearn GaussianMixture fit on the pretrained latents, grafted into the
model's GMM prior params, (3) full ELBO training with the clustering-accuracy
validation callback.
"""
import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax
from absl import app, flags
from ml_collections.config_flags import config_flags

from posterior_matching_tpu.runtime import configure_environment

configure_environment()

from sklearn.mixture import GaussianMixture

from posterior_matching_tpu.data import load_datasets
from posterior_matching_tpu.eval import (
    ClusteringAccuracyCallback,
    clustering_accuracy,
)
from posterior_matching_tpu.models.vade import VADE
from posterior_matching_tpu.train import (
    CheckpointCallback,
    LearningRateLoggerCallback,
    TensorBoardCallback,
    Trainer,
    save_train_state,
)
from posterior_matching_tpu.utils import batch_process, make_run_dir

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

    config.lock()

    train_dataset, val_dataset = load_datasets(config.data)
    if config.get("device_resident_data", False):
        # HBM-resident training data + on-device batch gather; pair
        # with config.steps_per_call to remove the host input path.
        train_dataset = train_dataset.to_device_resident()
    data_key = "image" if "image" in train_dataset.element_spec else "features"

    model = VADE.from_config(config.model.to_dict())

    def pretrain_loss_fn(params, state, key, step, batch, is_training):
        loss = model.apply(
            {"params": params},
            batch[data_key],
            method=model.pretrain_loss,
            rngs={"dropout": key},
        )
        return loss, {}, state

    def loss_fn(params, state, key, step, batch, is_training):
        k_sample, k_dropout = jax.random.split(key)
        elbo = model.apply(
            {"params": params},
            batch[data_key],
            method=model.elbo,
            rngs={"sample": k_sample, "dropout": k_dropout},
        )
        return -jnp.mean(elbo), {}, state

    def init_fn(key, batch):
        k1, k2 = jax.random.split(key)
        variables = model.init(
            {"params": k1, "sample": k2, "dropout": k2},
            batch[data_key],
            method=model.elbo,
        )
        return variables["params"], {}

    def pred_fn(params, state, key, batch):
        probs = model.apply(
            {"params": params},
            batch[data_key],
            config.cluster_pred_num_samples,
            method=model.predict_cluster,
            rngs={"sample": key},
        )
        return jnp.argmax(probs, axis=-1)

    def encode_fn(params, key, batch):
        return model.apply(
            {"params": params}, batch[data_key], method=model.encode_mean
        )

    run_dir = make_run_dir(prefix=f"vade-{config.data.dataset}")
    print("Using run directory:", run_dir)
    save_train_meta(run_dir, config)

    resume_state = resume_state_from_flag()
    if resume_state is not None:
        # --resume_dir continues the final ELBO phase mid-run; the
        # pretraining and GMM-graft phases are already baked into the
        # checkpointed params.
        initial_params = None
    else:
        # Phases 1 and 2 consume their OWN dataset streams (same config ->
        # same shuffle seed -> same deterministic stream) so the phase-3
        # stream that ``train_dataset`` yields never depends on how many
        # batches the earlier phases drew. This is what makes --resume_dir
        # exact for the 3-phase pipeline: Trainer.fit's skip_stream(step)
        # only accounts for phase-3 steps, which is now the whole story.
        pretrain_dataset, _ = load_datasets(config.data)
        latents_dataset, _ = load_datasets(config.data)

        # -- phase 1: pretraining -----------------------------------------------
        pretrain_trainer = Trainer(
            pretrain_loss_fn, init_fn, optax.adam(config.pretrain_lr),
            seed=config.seed,
        )
        print("Pretraining...")
        pretrain_state = pretrain_trainer.fit(
            pretrain_dataset, config.pretrain_steps, validation_freq=10**9
        )
        save_train_state(
            os.path.join(run_dir, "pretrain_state.pkl"), pretrain_state
        )

        # -- phase 2: GMM fit on latents ------------------------------------------
        print("Fitting GMM...")
        key = jax.random.PRNGKey(config.seed)
        params_host = jax.device_get(pretrain_state.params)
        enc = lambda batch, k: encode_fn(params_host, k, batch)
        latents = batch_process(enc, latents_dataset, key=key)
        val_latents = batch_process(enc, val_dataset, key=key)

        gmm = GaussianMixture(
            n_components=config.model.num_components,
            covariance_type="diag",
            max_iter=300,
            n_init=10,
        )
        gmm.fit(latents)
        gmm_preds = gmm.predict(val_latents)
        targets = np.concatenate([b["label"] for b in val_dataset], axis=0)
        print(
            "GMM Accuracy:", round(clustering_accuracy(targets, gmm_preds), 4)
        )

        gmm_params = {
            "logits": np.log(gmm.weights_).astype(np.float32),
            "mu": gmm.means_.astype(np.float32),
            # diag covariances -> log of the SCALE (sqrt of variance)... the
            # reference grafts log(covariances_) directly as log_scale
            # (train_vade.py:116-122); we reproduce that behavior exactly.
            "log_scale": np.log(gmm.covariances_).astype(np.float32),
        }
        initial_params = dict(params_host)
        initial_params.update(gmm_params)

    # -- phase 3: ELBO training ---------------------------------------------------
    with open(os.path.join(run_dir, "model_config.json"), "w") as fp:
        json.dump(config.model.to_dict(), fp)

    schedule = optax.exponential_decay(**config.lr_schedule)
    optimizer = optax.chain(
        optax.scale_by_adam(**config.get("adam", {})),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    )

    trainer = Trainer(
        loss_fn, init_fn, optimizer, num_devices=1, seed=config.seed,
        steps_per_call=config.get("steps_per_call", 1),
    )

    callbacks = [
        ClusteringAccuracyCallback(pred_fn),
        CheckpointCallback(os.path.join(run_dir, "train_state.pkl")),
        LearningRateLoggerCallback(schedule),
        TensorBoardCallback(os.path.join(run_dir, "tb")),
    ]

    print("Starting main training...")
    trainer.fit(
        train_dataset,
        config.steps,
        resume_from=resume_state,
        val_dataset=val_dataset,
        validation_freq=config.validation_freq,
        callbacks=callbacks,
        initial_params=initial_params,
    )


if __name__ == "__main__":
    app.run(main)
