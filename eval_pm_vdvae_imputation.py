"""Evaluates PM-VDVAE imputation: PSNR + PRD precision/recall.

Drop-in equivalent of the reference's ``eval_pm_vdvae_imputation.py`` (images
in [0, 255]; PSNR computed on the [0, 1]-rescaled mean imputation; PRD over
inception-style embeddings; results under ``<run_dir>/imputation_results/``).
Embeddings run accelerator-batched instead of via a ray CPU pool
(reference eval_pm_vdvae_imputation.py:134-161).
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from absl import app, flags
from tqdm import tqdm

from posterior_matching_tpu.runtime import configure_environment

configure_environment()

from posterior_matching_tpu import masking
from posterior_matching_tpu.data import load_eval_dataset
from posterior_matching_tpu.parallel import create_mesh
from posterior_matching_tpu.parallel.mesh import shard_batch
from posterior_matching_tpu.eval import (
    compute_prd_from_embedding,
    embedder_provenance,
    get_inception_embeddings,
    prd_to_max_f_beta_pair,
)
from posterior_matching_tpu.models.vdvae import (
    PosteriorMatchingVDVAE,
    vdvae_impute,
)
from posterior_matching_tpu.train import load_train_state

flags.DEFINE_string(
    "run_dir", default=None, required=True,
    help="The run directory of the model to evaluate.",
)
flags.DEFINE_string(
    "dataset", default=None, required=True, help="The dataset to evaluate on."
)
flags.DEFINE_string(
    "mask_generator", default=None, required=True,
    help="The name of the mask generator to use.",
)
flags.DEFINE_integer(
    "num_instances", default=None, help="The number of instances to evaluate."
)
flags.DEFINE_integer("batch_size", default=32, help="The batch size.")
flags.DEFINE_integer(
    "num_samples", default=10,
    help="The number of imputations per instance.",
)
flags.DEFINE_integer(
    "num_trials", default=5,
    help="The number of trials to compute means and std. over.",
)


def main(_):
    dataset = load_eval_dataset(
        flags.FLAGS.dataset,
        flags.FLAGS.batch_size,
        flags.FLAGS.num_instances,
        normalize_images=False,
    )

    run_dir = flags.FLAGS.run_dir
    with open(os.path.join(run_dir, "model_config.json")) as fp:
        model_config = json.load(fp)
    model_state = load_train_state(os.path.join(run_dir, "train_state.pkl"))

    model = PosteriorMatchingVDVAE.from_config(model_config)
    mask_fn = masking.get_mask_generator(flags.FLAGS.mask_generator)
    params = (
        model_state.ema_params
        if model_state.ema_params is not None
        else model_state.params
    )
    variables = {"params": params}
    num_samples = flags.FLAGS.num_samples

    @jax.jit
    def eval_step(key, batch):
        k_mask, k_sample = jax.random.split(key)
        batch = masking.add_mask(batch, k_mask, mask_fn)
        x, b = batch["image"], batch["mask"]
        imputations = vdvae_impute(
            model, variables, x, b, k_sample, num_samples=num_samples
        )  # [B, S, H, W, C] in [0, 255]
        mean_imputation = jnp.mean(imputations, axis=1) / 255.0
        mse = jnp.mean((mean_imputation - x / 255.0) ** 2, axis=(1, 2, 3))
        psnr = -10.0 * jnp.log10(mse)
        return psnr, imputations / 255.0

    mesh = create_mesh()  # eval parallelism: batch sharded over all chips
    key = jax.random.PRNGKey(91)
    total = dataset.cardinality()

    real_images = (
        np.concatenate([b["image"] for b in dataset], axis=0) / 255.0
    )
    real_embeddings = get_inception_embeddings(real_images, batch_size=16)
    del real_images

    psnrs, prd_data = [], []
    for trial in range(flags.FLAGS.num_trials):
        trial_psnrs, imputations = [], []
        for batch in tqdm(dataset, total=total, desc=f"Trial {trial + 1}"):
            key, k = jax.random.split(key)
            psnr, imp = eval_step(k, shard_batch(batch, mesh))
            trial_psnrs.append(np.asarray(psnr))
            imputations.append(np.asarray(imp))
        psnrs.append(np.concatenate(trial_psnrs, axis=0))
        imputations = np.concatenate(imputations, axis=0)

        fake_embeddings = np.stack(
            [
                get_inception_embeddings(
                    imputations[:, i], batch_size=16, verbose=False
                )
                for i in range(num_samples)
            ],
            axis=1,
        )
        prd_data.append(
            np.array(
                [
                    compute_prd_from_embedding(
                        eval_data=fake_embeddings[:, i],
                        ref_data=real_embeddings,
                        num_clusters=20,
                        num_angles=1001,
                        num_runs=10,
                    )
                    for i in tqdm(range(num_samples), desc="Computing PRD")
                ]
            )
        )

    psnrs = np.array(psnrs)
    prd_data = np.array(prd_data)

    per_trial_psnr = np.mean(np.ma.masked_invalid(psnrs), axis=1).data
    per_trial_prd = np.mean(prd_data, axis=1)
    f_scores = np.array(
        [prd_to_max_f_beta_pair(x[0], x[1], beta=8) for x in per_trial_prd]
    )

    results_dir = os.path.join(run_dir, "imputation_results")
    os.makedirs(results_dir, exist_ok=True)
    np.save(os.path.join(results_dir, "psnrs.npy"), psnrs)
    np.save(os.path.join(results_dir, "prd_data.npy"), prd_data)
    np.save(os.path.join(results_dir, "f_scores.npy"), f_scores)
    # Provenance: PRD numbers are only reference/paper-comparable when the
    # embedder is the real TF-Hub inception (eval/embeddings.py).
    embedder = embedder_provenance()
    with open(os.path.join(results_dir, "embedder.txt"), "w") as f:
        f.write(embedder + "\n")

    f_means, f_stds = np.mean(f_scores, axis=0), np.std(f_scores, axis=0)
    print("\n****RESULTS****")
    print(f"PSNR: {np.mean(per_trial_psnr).item()} ± {np.std(per_trial_psnr).item()}")
    print(f"Precision: {f_means[1]} ± {f_stds[1]}  [embedder: {embedder}]")
    print(f"Recall: {f_means[0]} ± {f_stds[0]}  [embedder: {embedder}]")


if __name__ == "__main__":
    app.run(main)
