"""Active-feature-acquisition plots from collected trajectories.

Script equivalent of the reference's
``notebooks/greedy_acquisition_plots.ipynb``: load the trajectory pickles
written by ``eval_greedy_acquisition.py`` and plot (1) mean imputation RMSE
vs. acquisition step for the sampling and lookahead strategies, and (2) an
imputation strip for one episode (image data only).

Usage:
    python examples/greedy_acquisition_plot.py \
        --run_dir runs/lookahead-mnist16-<ts>
"""
import os
import pickle

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from absl import app, flags

flags.DEFINE_string("run_dir", default=None, required=True,
                    help="Run dir containing trajectories/ from "
                    "eval_greedy_acquisition.py.")
flags.DEFINE_integer("episode", default=1,
                     help="Which episode to show in the imputation strip.")
flags.DEFINE_string("output_prefix", default=None,
                    help="Output prefix (default <run_dir>/acquisition).")


def main(_):
    run_dir = flags.FLAGS.run_dir
    tdir = os.path.join(run_dir, "trajectories")
    with open(os.path.join(tdir, "sampling_trajectories.pkl"), "rb") as fp:
        sampling = pickle.load(fp)
    with open(os.path.join(tdir, "lookahead_trajectories.pkl"), "rb") as fp:
        lookahead = pickle.load(fp)
    prefix = flags.FLAGS.output_prefix or os.path.join(run_dir, "acquisition")

    # -- RMSE curves ---------------------------------------------------------
    rmse_s = np.mean(np.stack([t["rmse"] for t in sampling]), axis=0)
    rmse_l = np.mean(np.stack([t["rmse"] for t in lookahead]), axis=0)
    steps = np.arange(len(rmse_s))
    plt.figure(figsize=(5, 3.5))
    plt.plot(steps, rmse_s, linewidth=3, label="Sampling", color="#66c2a5")
    plt.plot(steps, rmse_l, linewidth=3, label="Lookahead", color="#8da0cb")
    plt.xlabel("Acquisition Step")
    plt.ylabel("RMSE")
    plt.legend()
    plt.grid(visible=True, axis="y")
    plt.savefig(f"{prefix}_rmse.png", dpi=150, bbox_inches="tight")
    plt.close()
    print(f"final RMSE: sampling={rmse_s[-1]:.4f} lookahead={rmse_l[-1]:.4f}")

    # -- imputation strip (image data) ---------------------------------------
    traj = lookahead[min(flags.FLAGS.episode, len(lookahead) - 1)]
    x = np.asarray(traj["truth"])
    if x.ndim < 2 or x.size != int(np.sqrt(x.size)) ** 2:
        side = int(round(np.sqrt(x.size)))
        if side * side != x.size:
            print("non-square data; skipping imputation strip")
            print(f"saved {prefix}_rmse.png")
            return
        x = x.reshape(side, side)
    else:
        x = x.reshape(int(np.sqrt(x.size)), -1)

    times = [t for t in (1, 5, 10, 20, 30) if t < len(traj["mask"])]
    if not times:
        print("episode too short for an imputation strip; skipping")
        print(f"saved {prefix}_rmse.png")
        return
    fig, axes = plt.subplots(
        2, len(times) + 1, figsize=(1.2 * (len(times) + 1), 2.6),
        squeeze=False,
    )
    for i, t in enumerate(times):
        b = np.asarray(traj["mask"][t]).reshape(x.shape)
        imp = np.asarray(traj["reconstruction"][t]).reshape(x.shape)
        axes[0, i].imshow(x * b, cmap="gray", vmin=0, vmax=1)
        axes[0, i].set_title(f"t={t}", fontsize=8)
        axes[1, i].imshow(imp, cmap="gray", vmin=0, vmax=1)
        for ax in (axes[0, i], axes[1, i]):
            ax.set_xticks([]), ax.set_yticks([])
    axes[0, -1].imshow(x, cmap="gray", vmin=0, vmax=1)
    axes[0, -1].set_title("truth", fontsize=8)
    axes[1, -1].axis("off")
    axes[0, -1].set_xticks([]), axes[0, -1].set_yticks([])
    axes[0, 0].set_ylabel("observed", fontsize=8)
    axes[1, 0].set_ylabel("imputed", fontsize=8)
    plt.savefig(f"{prefix}_strip.png", dpi=150, bbox_inches="tight")
    print(f"saved {prefix}_rmse.png and {prefix}_strip.png")


if __name__ == "__main__":
    app.run(main)
