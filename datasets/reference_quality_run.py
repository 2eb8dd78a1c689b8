"""Trains and evaluates the REFERENCE implementation on the same real data.

The round's correctness gate is quality parity with the reference — but the
reference publishes no numbers, so the baseline must be self-measured
(BASELINE.md). This harness runs the reference's OWN code end-to-end on the
real local-drop datasets (datasets/prepare_local.py) and reports NRMSE/AC-LL
through the reference's own eval protocol, giving a same-data, same-protocol
quality baseline to compare our framework's numbers against.

What runs (all reference code, over the textbook shims in tests/refshims):

- model: ``PosteriorMatchingVAE.from_config`` (reference vae.py:61-118) with
  the hyperparameters of OUR config for the dataset (the config dicts are
  drop-in compatible by design).
- loss: the reference's training objective — ``-(E[rec_ll] - beta*KL)
  + matching_coef * (-E[matching_ll])`` with the cyclic beta schedule
  (reference train_pm_vae.py:58-76).
- optimizer: the reference's exact optax chain — scale_by_adam +
  add_decayed_weights(wd, ndim!=1 mask) + scale_by_schedule(exp decay) +
  scale(-1) (reference train_pm_vae.py:88-98).
- update semantics: bax is external/unpublished; its documented behavior is
  reproduced (one jitted value_and_grad + optax update per host batch,
  SURVEY.md L2), as in bench_reference.py.
- input pipeline behavior: per-batch host-side ``BernoulliMaskGenerator``
  (the reference's tf.py_function callback work, reference masking.py:342)
  + gaussian training noise (reference utils.py:108-116).
- eval: the reference's UCI protocol — Bernoulli(0.5) masks,
  mean-of-IS-samples imputation + ``is_log_prob``, ``hk.PRNGSequence(91)``,
  N trials (reference eval_pm_vae_uci.py:36-43,52,82-103). NRMSE excludes
  zero-variance features exactly as our eval does (eval_pm_vae_uci.py) so
  the two numbers are comparable on datasets with constant features.

Usage:
    PM_TPU_PLATFORM=cpu python datasets/reference_quality_run.py \
        --dataset digits_flat --config pm_vae_digits [--steps N]

Appends one JSON record to REFERENCE_QUALITY.json.
"""
import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"
SHIM_ROOT = os.path.join(REPO_ROOT, "tests", "refshims")

sys.path.insert(0, REPO_ROOT)

from posterior_matching_tpu.runtime import configure_environment  # noqa: E402

configure_environment()

for _p in (SHIM_ROOT, REFERENCE_ROOT):
    if _p not in sys.path:
        sys.path.append(_p)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _load_our_config(name):
    path = os.path.join(REPO_ROOT, "configs", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"our_config_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.get_config()


def _nrmse(imputations, true_data, observed_mask):
    """Delegates to ``eval_pm_vae_uci.nrmse_score`` — the SAME function that
    computes the framework's own numbers (incl. the zero-variance-feature
    exclusion) — so the ours-vs-reference quality table can never drift onto
    two NRMSE definitions."""
    from eval_pm_vae_uci import nrmse_score

    return nrmse_score(imputations, true_data, observed_mask)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="digits_flat")
    ap.add_argument("--config", default="pm_vae_digits")
    ap.add_argument("--steps", type=int, default=None,
                    help="Override the config's training steps.")
    ap.add_argument("--eval_batch_size", type=int, default=32)
    ap.add_argument("--num_samples", type=int, default=128)
    ap.add_argument("--num_trials", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(REPO_ROOT,
                                                  "REFERENCE_QUALITY.json"))
    args = ap.parse_args()

    import haiku as hk
    import optax

    from posterior_matching.masking import BernoulliMaskGenerator
    from posterior_matching.models.vae import PosteriorMatchingVAE as RefVAE

    from posterior_matching_tpu.train.schedules import get_beta_schedule

    config = _load_our_config(args.config)
    model_config = config.model.to_dict()
    steps = int(args.steps or config.steps)
    batch_size = int(config.data.train_batch_size)
    noise = float(config.data.get("training_noise", 0.0))

    data_dir = os.environ.get("PM_TPU_DATA_DIR", os.path.join(REPO_ROOT, "data"))
    train_np = np.load(os.path.join(data_dir, args.dataset, "train.npz"))
    test_np = np.load(os.path.join(data_dir, args.dataset, "test.npz"))
    x_train = np.asarray(train_np["features"], np.float32)
    x_test = np.asarray(test_np["features"], np.float32)

    # --- training (reference loss/optimizer; bax-documented update loop) ---
    beta_schedule = get_beta_schedule(config.get("beta", {}).to_dict())

    def loss_fn(step, batch):
        model = RefVAE.from_config(model_config)
        out = model(batch["features"], batch["mask"], is_training=True)
        beta = beta_schedule(step)
        elbo = jnp.mean(out["reconstruction_ll"] - beta * out["kl"])
        matching_loss = -jnp.mean(out["matching_ll"])
        return -elbo + matching_loss

    transformed = hk.transform_with_state(loss_fn)

    schedule = optax.exponential_decay(**config.lr_schedule.to_dict())
    optimizer = optax.chain(
        optax.scale_by_adam(),
        optax.add_decayed_weights(
            config.get("weight_decay", 0.0),
            mask=lambda p: jax.tree.map(lambda x: x.ndim != 1, p),
        ),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    )

    mask_gen = BernoulliMaskGenerator()
    rng = np.random.RandomState(args.seed)

    def host_batch(step):
        idx = rng.randint(0, x_train.shape[0], size=batch_size)
        x = x_train[idx]
        if noise:
            x = x + rng.normal(0.0, noise, x.shape).astype(np.float32)
        b = mask_gen(x.shape).astype(np.float32)
        return {"features": x, "mask": b}

    prng = hk.PRNGSequence(args.seed)
    params, state = transformed.init(next(prng), 0, host_batch(0))
    opt_state = optimizer.init(params)

    @jax.jit
    def update(params, state, opt_state, key, step, batch):
        (loss, new_state), grads = jax.value_and_grad(
            transformed.apply, has_aux=True
        )(params, state, key, step, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state, opt_state, loss

    t0 = time.perf_counter()
    loss = None
    for step in range(steps):
        batch = host_batch(step)
        params, state, opt_state, loss = update(
            params, state, opt_state, next(prng),
            np.int32(step),  # array, not python int: no per-step retrace
            batch,
        )
        if step % max(steps // 10, 1) == 0:
            print(f"[ref train {step}/{steps}] loss={float(loss):.4f}",
                  flush=True)
    train_secs = time.perf_counter() - t0
    print(f"reference training done in {train_secs:.1f}s "
          f"({steps / train_secs:.2f} steps/s)")

    # --- eval (the reference's own protocol, eval_pm_vae_uci.py) ---
    # Small UCI tables (wine: 17 test rows) are smaller than the default
    # batch; clamp so n_eval never rounds down to zero.
    eval_batch_size = min(args.eval_batch_size, x_test.shape[0])
    n_eval = (x_test.shape[0] // eval_batch_size) * eval_batch_size
    x_eval = x_test[:n_eval]

    def eval_fn(batch):
        model = RefVAE.from_config(model_config)
        x, b = batch["features"], batch["mask"]
        imputed = model.impute(x, b, num_samples=args.num_samples)
        imputed = jnp.mean(imputed, axis=0)
        _, log_p_xu_given_xo = model.is_log_prob(
            x, b, num_samples=args.num_samples
        )
        return imputed, log_p_xu_given_xo

    eval_apply = jax.jit(hk.transform_with_state(eval_fn).apply)

    eval_mask_gen = BernoulliMaskGenerator()
    eval_prng = hk.PRNGSequence(91)  # reference eval_pm_vae_uci.py:101
    imputations, masks, lls = [], [], []
    for trial in range(args.num_trials):
        ims, bs, ls = [], [], []
        for i in range(0, n_eval, eval_batch_size):
            x = x_eval[i : i + eval_batch_size]
            b = eval_mask_gen(x.shape).astype(np.float32)
            (im, ll), _ = eval_apply(
                params, state, next(eval_prng),
                {"features": x, "mask": b},
            )
            ims.append(np.asarray(im))
            bs.append(b)
            ls.append(np.asarray(ll))
        imputations.append(np.vstack(ims))
        masks.append(np.vstack(bs))
        lls.append(np.hstack(ls))
        print(f"[ref eval] trial {trial + 1}/{args.num_trials} done",
              flush=True)

    imputations = np.array(imputations)
    masks = np.array(masks)
    lls = np.array(lls)
    x_b = np.broadcast_to(x_eval[None], imputations.shape)
    nrmse = _nrmse(imputations, x_b, masks)
    ac_lls = np.mean(lls, axis=1)

    record = {
        "metric": "reference_impl_quality",
        "dataset": args.dataset,
        "config": args.config,
        "steps": steps,
        "num_samples": args.num_samples,
        "num_trials": args.num_trials,
        "nrmse_mean": float(np.mean(nrmse)),
        "nrmse_std": float(np.std(nrmse)),
        "ac_ll_mean": float(np.mean(ac_lls)),
        "ac_ll_std": float(np.std(ac_lls)),
        "train_steps_per_sec": steps / train_secs,
        "platform": jax.default_backend(),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print("\n****REFERENCE RESULTS****")
    print(f"NRMSE: {record['nrmse_mean']} ± {record['nrmse_std']}")
    print(f"AC LL: {record['ac_ll_mean']} ± {record['ac_ll_std']}")

    records = []
    try:
        with open(args.out) as f:
            records = json.load(f)
    except (OSError, ValueError):
        pass
    records.append(record)
    with open(args.out, "w") as f:
        json.dump(records, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
