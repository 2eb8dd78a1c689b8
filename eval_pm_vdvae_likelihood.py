"""Evaluates PM-VDVAE likelihoods: BPD + arbitrary-conditioning LL via
importance sampling.

Drop-in equivalent of the reference's ``eval_pm_vdvae_likelihood.py`` (same
flags/protocol: per-device batch, 10k IS samples by default, 5 trials,
non-finite masking with the same thresholds, results under
``<run_dir>/likelihood_results/``). The jit-sharded eval step replaces the
reference's hand-rolled pmap wrapper (reference
eval_pm_vdvae_likelihood.py:122-134); masks are generated on device.
"""
import functools
import json
import math
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
from posterior_matching_tpu.models.vdvae import (
    PosteriorMatchingVDVAE,
    vdvae_is_log_probs,
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
flags.DEFINE_integer(
    "batch_size", default=625,
    help="The per-device batch size (the reference's default covers the 10k "
    "MNIST test set in one sweep on 8 cores).",
)
flags.DEFINE_integer(
    "num_samples", default=10000,
    help="The number of importance samples per instance.",
)
flags.DEFINE_integer(
    "batch_chunk", default=125,
    help="Per-device compute sub-batch. Bounds the decoder's per-block TriL "
    "working set ([chunk, res, res, k, k] intermediates) so the reference's "
    "625-per-device eval batch fits a single v5e chip; instances stream "
    "through the same jitted step chunk by chunk. Set >= batch_size to "
    "disable.",
)
flags.DEFINE_integer(
    "num_trials", default=5,
    help="The number of trials to compute means and std. over.",
)


def main(_):
    num_devices = jax.local_device_count()
    dataset = load_eval_dataset(
        flags.FLAGS.dataset,
        flags.FLAGS.batch_size * num_devices,
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
        k_mask, k_is = jax.random.split(key)
        batch = masking.add_mask(batch, k_mask, mask_fn)
        x, b = batch["image"], batch["mask"]
        return vdvae_is_log_probs(
            model, variables, x, b, k_is, num_samples=num_samples
        )

    mesh = create_mesh()  # eval parallelism: batch sharded over all chips
    key = jax.random.PRNGKey(91)
    total = dataset.cardinality()

    # Memory-bounding sub-batches: each host batch is split into
    # chunk_rows-sized slices (equal share per device) before sharding, so
    # one jitted step never materializes more than batch_chunk instances'
    # TriL chains per device. batch_size stays the reference's CLI contract.
    chunk_rows = max(flags.FLAGS.batch_chunk, 1) * num_devices

    @functools.lru_cache(maxsize=None)
    def effective_chunk(n):
        """Largest slice size <= chunk_rows that divides n exactly: every
        sub-batch then has the SAME shape, so eval_step compiles once per
        distinct batch size instead of once more for a ragged tail slice
        (a second cold compile costs minutes through the remote-compile
        tunnel)."""
        for c in range(min(chunk_rows, n), 0, -1):
            if n % c == 0:
                return c

    x_lls, xo_lls = [], []
    for trial in range(flags.FLAGS.num_trials):
        x_lls.append([])
        xo_lls.append([])
        for batch in tqdm(dataset, total=total, desc=f"Trial {trial + 1}"):
            n = len(next(iter(batch.values())))
            rows = effective_chunk(n)
            for s in range(0, n, rows):
                sub = {k2: v[s : s + rows] for k2, v in batch.items()}
                key, k = jax.random.split(key)
                px, pxu = eval_step(k, shard_batch(sub, mesh))
                x_lls[-1].append(np.asarray(px))
                xo_lls[-1].append(np.asarray(px) - np.asarray(pxu))
        x_lls[-1] = np.concatenate(x_lls[-1], axis=0)
        xo_lls[-1] = np.concatenate(xo_lls[-1], axis=0)

    x_lls = np.array(x_lls)
    xo_lls = np.array(xo_lls)

    bpd = -x_lls / (math.prod(model_config["image_shape"]) * np.log(2))
    ac_lls = x_lls - xo_lls

    results_dir = os.path.join(run_dir, "likelihood_results")
    os.makedirs(results_dir, exist_ok=True)
    np.save(os.path.join(results_dir, "x_lls.npy"), x_lls)
    np.save(os.path.join(results_dir, "xo_lls.npy"), xo_lls)
    np.save(os.path.join(results_dir, "bpd.npy"), bpd)

    # Very large IS sample counts occasionally produce non-finite values;
    # mask them exactly as the reference does (its measured rates: 0/50k BPD,
    # 2/50k AC-LL on MNIST — reference eval_pm_vdvae_likelihood.py:176-192).
    bpd = np.ma.masked_array(
        bpd, mask=(~np.isfinite(bpd)) | (np.abs(bpd) > 1e10)
    )
    ac_lls = np.ma.masked_array(
        ac_lls, mask=(~np.isfinite(ac_lls)) | (np.abs(ac_lls) > 1e10)
    )

    per_trial_bpd = np.mean(bpd, axis=1)
    per_trial_ac = np.mean(ac_lls, axis=1)

    print("\n****RESULTS****")
    print(f"BPD: {np.mean(per_trial_bpd).item()} ± {np.std(per_trial_bpd).item()}")
    print(f"AC LL: {np.mean(per_trial_ac).item()} ± {np.std(per_trial_ac).item()}")


if __name__ == "__main__":
    app.run(main)
