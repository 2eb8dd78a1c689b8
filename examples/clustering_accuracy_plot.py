"""Partially observed clustering accuracy vs. percent-observed curve.

Script equivalent of the reference's ``notebooks/clustering_plots.ipynb``:
load a PM-VaDE run (``train_pm_vade.py``), predict clusters from partially
observed inputs at a grid of observation rates, and plot clustering accuracy
against the observed fraction.

TPU-first departure from the notebook: the notebook loops
``41 rates x batches`` on the host, re-masking and re-dispatching per rate;
here ONE jitted call per batch evaluates the whole rate grid (vmap over
rates, shared forward batching), so the sweep runs at device speed.

Usage:
    python examples/clustering_accuracy_plot.py \
        --run_dir runs/pm-vade-mnist-<ts> --dataset mnist
"""
import json
import os

import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from absl import app, flags

import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from posterior_matching_tpu.runtime import configure_environment

configure_environment()

from posterior_matching_tpu.data import load_eval_dataset
from posterior_matching_tpu.eval.clustering import clustering_accuracy
from posterior_matching_tpu.models.vade import PosteriorMatchingVADE
from posterior_matching_tpu.train import load_train_state

flags.DEFINE_string("run_dir", default=None, required=True,
                    help="A run directory created by train_pm_vade.py.")
flags.DEFINE_string("dataset", default="mnist", help="Dataset to evaluate.")
flags.DEFINE_integer("num_samples", default=50,
                     help="Posterior samples per cluster-probability estimate.")
flags.DEFINE_integer("num_rates", default=41,
                     help="Grid size of observed-fraction values in [0, 1].")
flags.DEFINE_integer("batch_size", default=256, help="Eval batch size.")
flags.DEFINE_string("output", default=None,
                    help="Output PNG (default <run_dir>/clustering_accuracy.png).")


def main(_):
    run_dir = flags.FLAGS.run_dir
    with open(os.path.join(run_dir, "model_config.json")) as fp:
        model_config = json.load(fp)
    state = load_train_state(os.path.join(run_dir, "train_state.pkl"))

    model = PosteriorMatchingVADE.from_config(model_config)
    variables = {"params": state.params}
    rates = np.linspace(0.0, 1.0, flags.FLAGS.num_rates)
    num_samples = flags.FLAGS.num_samples

    def predict_at_rate(x, p, key):
        k_mask, k_sample = jax.random.split(key)
        b = jax.random.bernoulli(k_mask, p, x.shape).astype(x.dtype)
        probs = model.apply(
            variables, x, b, num_samples,
            method=model.partial_predict_cluster,
            rngs={"sample": k_sample},
        )
        return jnp.argmax(probs, axis=-1)

    @jax.jit
    def predict_all_rates(x, key):
        keys = jax.random.split(key, len(rates))
        return jax.vmap(predict_at_rate, in_axes=(None, 0, 0))(
            x, jnp.asarray(rates), keys
        )  # [num_rates, B]

    ds = load_eval_dataset(
        flags.FLAGS.dataset, flags.FLAGS.batch_size, drop_remainder=False
    )
    key = jax.random.PRNGKey(91)
    y_true, y_pred = [], []
    for batch in ds:
        key, k = jax.random.split(key)
        x = batch["image"] if "image" in batch else batch["features"]
        y_pred.append(np.asarray(predict_all_rates(x, k)))
        y_true.append(np.asarray(batch["label"]))
    y_true = np.concatenate(y_true)
    y_pred = np.concatenate(y_pred, axis=1)

    accs = [clustering_accuracy(y_true, y_pred[i]) for i in range(len(rates))]

    try:
        import seaborn as sns

        sns.lineplot(x=rates, y=accs, linewidth=3, color="#8da0cb")
        sns.despine()
    except ImportError:
        plt.plot(rates, accs, linewidth=3, color="#8da0cb")
    plt.xlabel("Percent Observed")
    plt.ylabel("Clustering Accuracy")
    plt.grid(visible=True, axis="y")

    out = flags.FLAGS.output or os.path.join(
        run_dir, "clustering_accuracy.png"
    )
    plt.savefig(out, dpi=150, bbox_inches="tight")
    print(f"accuracy at full observation: {accs[-1]:.4f}")
    print(f"saved {out}")


if __name__ == "__main__":
    app.run(main)
