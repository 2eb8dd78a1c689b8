"""Latent-space projection of partial posteriors (paper Figure 3 style).

Script equivalent of the reference's ``notebooks/mnist_plots.ipynb``: embed
the full-posterior latent means of the test set into 2-D (UMAP when
installed, else PCA — this environment ships sklearn but not umap-learn),
then overlay samples from the *partially observed* posterior q(z|x_o) for a
few instance/mask pairs, showing how the partial posterior spreads over the
plausible-completion region and contracts as more is observed.

Usage:
    python examples/latent_projection_plot.py \
        --run_dir runs/pm-vae-mnist-<ts> --dataset mnist
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
from posterior_matching_tpu.models.vae import PosteriorMatchingVAE
from posterior_matching_tpu.train import load_train_state
from posterior_matching_tpu.utils import batch_process

flags.DEFINE_string("run_dir", default=None, required=True,
                    help="A run directory created by train_pm_vae.py.")
flags.DEFINE_string("dataset", default="mnist", help="Dataset to embed.")
flags.DEFINE_integer("num_samples", default=500,
                     help="Partial-posterior samples per example mask.")
flags.DEFINE_string("output", default=None,
                    help="Output PNG (default <run_dir>/latent_projection.png).")


def main(_):
    run_dir = flags.FLAGS.run_dir
    with open(os.path.join(run_dir, "model_config.json")) as fp:
        model_config = json.load(fp)
    state = load_train_state(os.path.join(run_dir, "train_state.pkl"))

    model = PosteriorMatchingVAE.from_config(model_config)
    variables = {"params": state.params}

    ds = load_eval_dataset(
        flags.FLAGS.dataset, 256, drop_remainder=False
    )

    def codes_and_labels(batch):
        dist = model.apply(variables, batch["image"], method=model.encode)
        return {"code": dist.mean(), "label": batch["label"]}

    out = batch_process(codes_and_labels, ds)
    codes = np.asarray(out["code"])
    labels = np.asarray(out["label"])

    try:
        from umap import UMAP  # optional; not in this image

        proj = UMAP()
        proj_name = "UMAP"
    except ImportError:
        from sklearn.decomposition import PCA

        proj = PCA(n_components=2)
        proj_name = "PCA"
    proj_codes = proj.fit_transform(codes)

    # partial-posterior samples for one instance under increasing observation
    x0 = next(iter(ds))["image"][0]
    h = x0.shape[0]
    masks = [
        np.zeros_like(x0),  # nothing observed
        (np.arange(h)[:, None, None] >= 2 * h // 3)
        * np.ones_like(x0),  # bottom third
        (np.arange(h)[:, None, None] >= h // 3) * np.ones_like(x0),
        np.ones_like(x0),  # fully observed
    ]

    @jax.jit
    def partial_samples(x, b, key):
        x_o_b = jnp.concatenate([x[None] * b[None], b[None]], axis=-1)
        dist = model.apply(variables, x_o_b, method=model.encode_partial)
        return dist.sample(key, (flags.FLAGS.num_samples,))[:, 0]

    key = jax.random.PRNGKey(91)
    fig, ax = plt.subplots(figsize=(6, 5))
    ax.scatter(
        proj_codes[:, 0], proj_codes[:, 1], c=labels, cmap="tab10", s=2,
        alpha=0.2, linewidths=0,
    )
    colors = ["#000000", "#e41a1c", "#377eb8", "#4daf4a"]
    names = ["0%", "33%", "67%", "100%"]
    for b, c, nm in zip(masks, colors, names):
        key, k = jax.random.split(key)
        z = np.asarray(partial_samples(jnp.asarray(x0), jnp.asarray(b), k))
        p = proj.transform(z)
        ax.scatter(p[:, 0], p[:, 1], c=c, s=6, label=f"q(z|x_o) {nm} observed")
    ax.legend(markerscale=2, fontsize=8)
    ax.set_title(f"{proj_name} of latent means + partial posteriors")
    ax.set_xticks([]), ax.set_yticks([])

    out_path = flags.FLAGS.output or os.path.join(
        run_dir, "latent_projection.png"
    )
    plt.savefig(out_path, dpi=150, bbox_inches="tight")
    print(f"saved {out_path}")


if __name__ == "__main__":
    app.run(main)
