"""Collects greedy active-feature-acquisition trajectories.

Drop-in equivalent of the reference's ``eval_greedy_acquisition.py`` (same
flags; trajectories pickled under ``<run_dir>/trajectories/``). Each
31-step double rollout jits into a single XLA program per instance; the whole
per-instance episode (the most compute-dense single-instance graph in the
reference, SURVEY.md §3.5) runs on the accelerator with no per-step host
round trips.
"""
import functools
import json
import os
import pickle

import jax
import numpy as np
from absl import app, flags
from tqdm import tqdm

from posterior_matching_tpu.runtime import configure_environment

configure_environment()

from posterior_matching_tpu.acquisition import (
    make_acquisition_eval_fn,
    make_collect_trajectory_fn,
)
from posterior_matching_tpu.data import load_eval_dataset
from posterior_matching_tpu.models.lookahead import LookaheadPosterior
from posterior_matching_tpu.train import load_train_state

flags.DEFINE_string(
    "run_dir", default=None, required=True,
    help="The run directory of the model to evaluate.",
)
flags.DEFINE_string(
    "dataset", default=None, required=True, help="The dataset to evaluate on."
)
flags.DEFINE_integer(
    "num_instances", default=1000, help="The number of instances to evaluate."
)
flags.DEFINE_integer(
    "num_samples", default=50,
    help="The number of samples to use for expectations.",
)
flags.DEFINE_integer(
    "episode_length", default=31, help="The length of episodes to collect."
)
flags.DEFINE_integer(
    "chunk_size", default=8,
    help="Instances rolled out together on device per dispatch (the 31-step "
    "scan vmaps over this many episodes; sized by HBM — each instance's "
    "sampling info-gain estimator holds num_samples x (features+1) forwards).",
)


def main(_):
    dataset = load_eval_dataset(
        flags.FLAGS.dataset, 32, flags.FLAGS.num_instances,
        drop_remainder=False,
    )
    data_key = (
        "image" if "image" in dataset.element_spec else "features"
    )
    data = np.concatenate([b[data_key] for b in dataset], axis=0)

    run_dir = flags.FLAGS.run_dir
    with open(os.path.join(run_dir, "lookahead_config.json")) as fp:
        lookahead_config = json.load(fp)
    with open(os.path.join(run_dir, "pm_vae_config.json")) as fp:
        pm_vae_config = json.load(fp)
    model_state = load_train_state(os.path.join(run_dir, "train_state.pkl"))

    model = LookaheadPosterior.from_config(lookahead_config, pm_vae_config)
    variables = {"params": model_state.params}

    eval_fn = make_acquisition_eval_fn(
        model, variables, flags.FLAGS.num_samples
    )
    # Rollouts batched ACROSS instances on device (the reference runs one
    # jitted trajectory per instance in a Python loop, reference
    # eval_greedy_acquisition.py:131): vmap the 31-step scan over a chunk of
    # instances and dispatch once per chunk.
    collect_batch = jax.jit(
        jax.vmap(
            make_collect_trajectory_fn(eval_fn, flags.FLAGS.episode_length)
        )
    )

    key = jax.random.PRNGKey(91)
    sampling_trajectories, lookahead_trajectories = [], []

    chunk = flags.FLAGS.chunk_size
    for start in tqdm(range(0, len(data), chunk), unit="chunks"):
        xb = data[start : start + chunk]
        key, k = jax.random.split(key)
        ks = jax.random.split(k, len(xb))
        s_t, l_t = jax.device_get(collect_batch(xb, ks))
        for i in range(len(xb)):
            s = {k2: np.asarray(v[i]) for k2, v in s_t.items()}
            l = {k2: np.asarray(v[i]) for k2, v in l_t.items()}
            s["truth"] = xb[i]
            l["truth"] = xb[i]
            sampling_trajectories.append(s)
            lookahead_trajectories.append(l)

    results_dir = os.path.join(run_dir, "trajectories")
    os.makedirs(results_dir, exist_ok=True)
    with open(
        os.path.join(results_dir, "sampling_trajectories.pkl"), "wb"
    ) as fp:
        pickle.dump(sampling_trajectories, fp)
    with open(
        os.path.join(results_dir, "lookahead_trajectories.pkl"), "wb"
    ) as fp:
        pickle.dump(lookahead_trajectories, fp)


if __name__ == "__main__":
    app.run(main)
