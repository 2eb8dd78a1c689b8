"""Evaluates a PM-VAE on a UCI dataset: NRMSE + arbitrary-conditioning LL.

Drop-in equivalent of the reference's ``eval_pm_vae_uci.py`` (same flags, same
protocol: Bernoulli(0.5) masks, mean of ``num_samples`` imputations,
importance-sampled log p(x_u|x_o), ``num_trials`` trials, results to
``<run_dir>/uci_results/{nrmse,ac_lls}.npy``). Masks are generated on device
inside the jitted eval step instead of via a host tf.py_function.
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
from posterior_matching_tpu.models.vae import PosteriorMatchingVAE
from posterior_matching_tpu.train import load_train_state

flags.DEFINE_string(
    "run_dir", default=None, help="The run directory of the model to evaluate.",
    required=True,
)
flags.DEFINE_string(
    "dataset", default=None, help="The dataset to evaluate on.", required=True
)
flags.DEFINE_integer(
    "num_instances", default=None, help="The number of instances to evaluate."
)
flags.DEFINE_integer("batch_size", default=32, help="The batch size.")
flags.DEFINE_integer(
    "num_samples", default=512, help="The number of samples to use for expectations."
)
flags.DEFINE_integer(
    "num_trials", default=5, help="The number of trials to compute means and std. over."
)


def nrmse_score(imputations, true_data, observed_mask):
    """Per-trial NRMSE over unobserved entries (reference
    eval_pm_vae_uci.py:60-66)."""
    error = (imputations - true_data) ** 2
    mse = np.sum(error, axis=-2) / np.count_nonzero(
        1.0 - observed_mask, axis=-2
    )
    std = np.std(true_data, axis=-2)
    nrmse = np.sqrt(mse) / std
    # Zero-variance features (e.g. always-blank corner pixels in the real
    # digits table) make the reference formula divide by zero; average only
    # over features whose normalization is defined. Identical to the
    # reference when every feature varies (the five UCI tables).
    valid = np.all(
        std.reshape(-1, std.shape[-1]) > 0, axis=0
    )  # 1-D over features; std is trial-invariant (x is broadcast)
    if not np.all(valid):
        print(
            f"NRMSE: excluding {int((~valid).sum())}/{valid.size} "
            "zero-variance features from the normalized average."
        )
    return np.mean(nrmse[..., valid], axis=-1)


def main(_):
    dataset = load_eval_dataset(
        flags.FLAGS.dataset,
        flags.FLAGS.batch_size,
        flags.FLAGS.num_instances,
    )

    data_np = np.vstack([b["features"] for b in dataset])

    with open(os.path.join(flags.FLAGS.run_dir, "model_config.json")) as fp:
        model_config = json.load(fp)
    model_state = load_train_state(
        os.path.join(flags.FLAGS.run_dir, "train_state.pkl")
    )

    model = PosteriorMatchingVAE.from_config(model_config)
    mask_fn = masking.get_mask_generator("BernoulliMaskGenerator")
    num_samples = flags.FLAGS.num_samples

    @jax.jit
    def eval_step(params, key, batch):
        k_mask, k1, k2 = jax.random.split(key, 3)
        batch = masking.add_mask(batch, k_mask, mask_fn)
        x, b = batch["features"], batch["mask"]
        imputed = model.apply(
            {"params": params},
            x,
            b,
            num_samples=num_samples,
            method=model.impute,
            rngs={"sample": k1},
        )
        imputed = jnp.mean(imputed, axis=0)
        _, log_p_xu_given_xo = model.apply(
            {"params": params},
            x,
            b,
            num_samples=num_samples,
            method=model.is_log_prob,
            rngs={"sample": k2},
        )
        return imputed, log_p_xu_given_xo, b

    params = model_state.params
    key = jax.random.PRNGKey(91)

    imputations, masks, lls = [], [], []
    for i in range(flags.FLAGS.num_trials):
        imputations.append([])
        masks.append([])
        lls.append([])
        for batch in tqdm(
            dataset,
            desc=f"Sampling (Trial {i + 1}/{flags.FLAGS.num_trials})",
            total=dataset.cardinality(),
        ):
            key, k = jax.random.split(key)
            im, ll, b = eval_step(params, k, batch)
            imputations[-1].append(np.asarray(im))
            masks[-1].append(np.asarray(b))
            lls[-1].append(np.asarray(ll))
        imputations[-1] = np.vstack(imputations[-1])
        masks[-1] = np.vstack(masks[-1])
        lls[-1] = np.hstack(lls[-1])

    imputations = np.array(imputations)
    masks = np.array(masks)
    lls = np.array(lls)
    x = np.broadcast_to(
        data_np[None], [flags.FLAGS.num_trials, *data_np.shape]
    )
    nrmse = nrmse_score(imputations, x, masks)
    lls = np.mean(lls, axis=1)

    results_dir = os.path.join(flags.FLAGS.run_dir, "uci_results")
    os.makedirs(results_dir, exist_ok=True)
    np.save(os.path.join(results_dir, "nrmse.npy"), nrmse)
    np.save(os.path.join(results_dir, "ac_lls.npy"), lls)

    print("\n****RESULTS****")
    print(f"NRMSE: {np.mean(nrmse).item()} ± {np.std(nrmse).item()}")
    print(f"AC LL: {np.mean(lls).item()} ± {np.std(lls).item()}")


if __name__ == "__main__":
    app.run(main)
