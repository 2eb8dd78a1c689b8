"""Reference-implementation quality baselines for the IMAGE pipelines.

Extends datasets/reference_quality_run.py (PM-VAE / UCI) to the three image
pipelines, closing the "ours-vs-reference on the same data" gap for
PSNR / BPD / AC-LL / clustering accuracy: the reference's OWN code (over the
textbook shims in tests/refshims) is trained and evaluated on the SAME real
local-drop data (datasets/prepare_local.py) with the SAME hyperparameters
(our config dicts are constructor-compatible by design) and the SAME eval
protocol as our numbers in BASELINE.md.

Stages (each appends one JSON record to REFERENCE_QUALITY.json):

- ``vqvae``     reference train_vqvae.py:57-108 — VQVAE(**model)["loss"],
                plain adam, digits16 in [0,1]; saves params for stage 2.
- ``pm_vqvae``  reference train_pm_vqvae.py:81-160 — conditional PixelCNN +
                partial encoder over the FROZEN stage-1 VQVAE (trainable
                predicate `not module_name.startswith("vqvae/")`), then the
                eval_pm_vqvae.py:121-141 protocol: vqvae_impute, mean over
                samples, PSNR = -10*log10(MSE), hk.PRNGSequence(91), trials.
- ``vdvae``     reference train_pm_vdvae.py:108-155 — loss = -elbo +
                mean(pm_kl), clip(200)+adam+wd+const-lr chain, EMA 0.999,
                skip-nonfinite, images in [0,255]; then BOTH reference eval
                protocols: eval_pm_vdvae_likelihood.py:156-216 (is_log_probs
                -> BPD / AC-LL with the same non-finite masking) and
                eval_pm_vdvae_imputation (impute -> PSNR on [0,1] images).
- ``vade``      reference train_vade.py:34-159 — 3-phase: autoencoder
                pretrain, sklearn GaussianMixture(diag, n_init=10) graft
                into {logits, mu, log_scale} (including the reference's
                log(cov)-as-log_scale quirk), ELBO training with the
                clustering-accuracy callback (GMM-fit / best-val / final).

Masks use the reference's own host-side generators (masking.py) — for the
16x16 digits the shape-generic RectangleMaskGenerator, exactly as our
configs choose (the reference's MNIST mixture hardcodes 28x28 geometry).

Usage (CPU; one stage at a time, vqvae before pm_vqvae):
    PM_TPU_PLATFORM=cpu python datasets/reference_quality_images.py \
        --stage vqvae [--steps N] [--seed S]
"""
import argparse
import importlib.util
import json
import os
import pickle
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


def _load_split(dataset, split, normalize):
    data_dir = os.environ.get("PM_TPU_DATA_DIR", os.path.join(REPO_ROOT, "data"))
    path = os.path.join(data_dir, dataset, f"{split}.npz")
    if not os.path.exists(path) and split == "val":
        # celeb_a names its held-out split "validation" (TFDS convention)
        alt = os.path.join(data_dir, dataset, "validation.npz")
        path = alt if os.path.exists(alt) else path
    z = np.load(path)
    arrays = {k: np.asarray(z[k]) for k in z.files}
    y = np.asarray(arrays["label"]) if "label" in arrays else None
    # same one-time spatial transform as our pipeline (celeb_a center-crop
    # -> 64x64, parity-tested against reference utils.py:68-77)
    from posterior_matching_tpu.data.datasets import _prepare_image_arrays

    arrays = _prepare_image_arrays(dataset, arrays)
    key = "image" if "image" in arrays else "features"
    x = np.asarray(arrays[key], np.float32)
    if key == "image" and normalize:
        x = x / 255.0
    return x, y, key


def _append_record(out_path, record):
    records = []
    try:
        with open(out_path) as f:
            records = json.load(f)
    except (OSError, ValueError):
        pass
    records.append(record)
    with open(out_path, "w") as f:
        json.dump(records, f, indent=1)
    print(json.dumps(record))


def _train_loop(update, params, state, opt_state, prng, steps, batch_fn,
                extra=None, log_every=None):
    """The bax-documented update loop (one jitted value_and_grad + optax
    update per host batch; SURVEY.md L2), as in reference_quality_run.py."""
    t0 = time.perf_counter()
    log_every = log_every or max(steps // 10, 1)
    loss = None
    for step in range(steps):
        batch = batch_fn(step)
        if extra is None:
            params, state, opt_state, loss = update(
                params, state, opt_state, next(prng), np.int32(step), batch)
        else:
            params, state, opt_state, extra, loss = update(
                params, state, opt_state, extra, next(prng),
                np.int32(step), batch)
        if step % log_every == 0:
            print(f"[ref train {step}/{steps}] loss={float(loss):.4f}",
                  flush=True)
    secs = time.perf_counter() - t0
    print(f"reference training done in {secs:.1f}s ({steps/secs:.2f} steps/s)")
    return params, state, opt_state, extra, secs


# ---------------------------------------------------------------------------
# Stage: VQVAE (reference train_vqvae.py)
# ---------------------------------------------------------------------------


def stage_vqvae(args):
    import haiku as hk
    import optax

    from posterior_matching.models.vqvae import VQVAE

    config = _load_our_config(args.config or "vqvae_digits16")
    model_config = config.model.to_dict()
    steps = int(args.steps or config.steps)
    batch_size = int(config.data.train_batch_size)
    x_train, _, _ = _load_split(config.data.dataset, "train", normalize=True)
    x_val, _, _ = _load_split(config.data.dataset, "val", normalize=True)

    def loss_fn(batch, is_training):
        model = VQVAE(**model_config)
        out = model(batch["image"], is_training=is_training)
        return out["loss"], {
            "reconstruction_loss": jnp.mean(out["reconstruction_loss"]),
            "perplexity": jnp.mean(out["vq_output"]["perplexity"]),
        }

    transformed = hk.transform_with_state(
        lambda batch: loss_fn(batch, is_training=True))
    eval_t = hk.transform_with_state(
        lambda batch: loss_fn(batch, is_training=False))

    optimizer = optax.adam(float(config.learning_rate))
    rng = np.random.RandomState(args.seed)

    def batch_fn(step):
        idx = rng.randint(0, x_train.shape[0], size=batch_size)
        return {"image": x_train[idx]}

    prng = hk.PRNGSequence(args.seed)
    params, state = transformed.init(next(prng), batch_fn(0))
    opt_state = optimizer.init(params)

    @jax.jit
    def update(params, state, opt_state, key, step, batch):
        def f(params):
            (loss, aux), new_state = transformed.apply(params, state, key,
                                                       batch)
            return loss, new_state
        (loss, new_state), grads = jax.value_and_grad(f, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state, opt_state, loss

    params, state, _, _, secs = _train_loop(
        update, params, state, opt_state, prng, steps, batch_fn)

    # val reconstruction loss (reference aux metric) for the record
    eval_apply = jax.jit(eval_t.apply)
    rls = []
    for i in range(0, (x_val.shape[0] // batch_size) * batch_size, batch_size):
        (_, aux), _ = eval_apply(params, state, next(prng),
                                 {"image": x_val[i:i + batch_size]})
        rls.append(float(aux["reconstruction_loss"]))

    workdir = os.path.join(args.workdir, "vqvae")
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "train_state.pkl"), "wb") as f:
        pickle.dump({"params": jax.device_get(params),
                     "state": jax.device_get(state)}, f)
    with open(os.path.join(workdir, "model_config.json"), "w") as f:
        json.dump(model_config, f)

    _append_record(args.out, {
        "metric": "reference_impl_quality_vqvae",
        "dataset": config.data.dataset,
        "config": args.config or "vqvae_digits16",
        "steps": steps,
        "seed": args.seed,
        "val_reconstruction_loss": float(np.mean(rls)),
        "train_steps_per_sec": steps / secs,
        "platform": jax.default_backend(),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    })


# ---------------------------------------------------------------------------
# Stage: PM-VQVAE (reference train_pm_vqvae.py + eval_pm_vqvae.py)
# ---------------------------------------------------------------------------


def stage_pm_vqvae(args):
    import haiku as hk
    import optax

    from posterior_matching import masking as ref_masking
    from posterior_matching.models.pixel_cnn import PixelCNN

    def get_mask_generator(name):
        # the reference's registry (masking.py:328-336) omits some concrete
        # classes (e.g. RectangleMaskGenerator); fall back to the class name
        try:
            return ref_masking.get_mask_generator(name)
        except KeyError:
            return getattr(ref_masking, name)()
    from posterior_matching.models.vqvae import (
        VQVAE, VQVAEPartialEncoder, vqvae_impute)

    config = _load_our_config(args.config or "pm_vqvae_digits16")
    steps = int(args.steps or config.steps)
    batch_size = int(config.data.train_batch_size)

    vqvae_dir = os.path.join(args.workdir, "vqvae")
    with open(os.path.join(vqvae_dir, "model_config.json")) as f:
        vqvae_config = json.load(f)
    with open(os.path.join(vqvae_dir, "train_state.pkl"), "rb") as f:
        vqvae_state = pickle.load(f)

    pixel_cnn_config = dict(config.pixel_cnn.to_dict())
    pixel_cnn_config["image_shape"] = tuple(pixel_cnn_config["image_shape"])
    pixel_cnn_config["num_indices"] = vqvae_config["num_embeddings"]
    conditional_dim = int(config.conditional_dim)

    x_train, _, _ = _load_split(config.data.dataset, "train", normalize=True)
    x_test, _, _ = _load_split(config.data.dataset, "test", normalize=True)

    def loss_fn(batch):
        # reference train_pm_vqvae.py:81-99
        vqvae = VQVAE(**vqvae_config)
        partial_encoder = VQVAEPartialEncoder(conditional_dim, vqvae_config)
        partial_posterior = PixelCNN(**pixel_cnn_config)
        encoding_indices = vqvae(batch["image"])["vq_output"]["encoding_indices"]
        x_o_b = jnp.concatenate(
            [batch["image"] * batch["mask"], batch["mask"]], axis=-1)
        cond_latents = partial_encoder(x_o_b)
        return -jnp.mean(partial_posterior.log_prob(
            encoding_indices, training=True, conditional_input=cond_latents))

    transformed = hk.transform_with_state(loss_fn)

    schedule = optax.exponential_decay(**config.lr_schedule.to_dict())
    optimizer = optax.chain(
        optax.scale_by_adam(**config.get("adam", {})),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    )

    # the config's own generator (reference train_pm_vqvae.py resolves the
    # same string via masking.get_mask_generator)
    mask_gen = get_mask_generator(config.data.mask_generator)
    rng = np.random.RandomState(args.seed)

    def batch_fn(step):
        idx = rng.randint(0, x_train.shape[0], size=batch_size)
        x = x_train[idx]
        b = mask_gen(x.shape).astype(np.float32)
        return {"image": x, "mask": b}

    prng = hk.PRNGSequence(args.seed)
    params, state = transformed.init(next(prng), batch_fn(0))
    # reference initializes training FROM the stage-1 checkpoint
    # (train_pm_vqvae.py:154-155) and freezes the vqvae subtree via
    # trainable_predicate (train_pm_vqvae.py:123-131).
    params = hk.data_structures.merge(params, vqvae_state["params"])
    state = hk.data_structures.merge(state, vqvae_state["state"])

    trainable, frozen = hk.data_structures.partition(
        lambda module_name, name, value: not module_name.startswith("vqvae/"),
        params)
    opt_state = optimizer.init(trainable)

    @jax.jit
    def update(trainable, state, opt_state, frozen, key, step, batch):
        def f(trainable):
            p = hk.data_structures.merge(frozen, trainable)
            (loss, new_state) = transformed.apply(p, state, key, batch)
            return loss, new_state
        (loss, new_state), grads = jax.value_and_grad(f, has_aux=True)(
            trainable)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        return (optax.apply_updates(trainable, updates), new_state, opt_state,
                frozen, loss)

    trainable, state, _, frozen, secs = _train_loop(
        update, trainable, state, opt_state, prng, steps, batch_fn,
        extra=frozen)
    params = hk.data_structures.merge(frozen, trainable)

    # --- eval: the reference's PSNR protocol (eval_pm_vqvae.py:121-141) ---
    def eval_fn(batch):
        vqvae = VQVAE(**vqvae_config)
        partial_encoder = VQVAEPartialEncoder(conditional_dim, vqvae_config)
        partial_posterior = PixelCNN(**pixel_cnn_config)
        imputations = vqvae_impute(
            vqvae, partial_encoder, partial_posterior,
            batch["image"], batch["mask"], num_samples=args.num_samples)
        mean_imputation = jnp.mean(imputations, axis=1)
        mse = jnp.mean((mean_imputation - batch["image"]) ** 2, axis=(1, 2, 3))
        return -10.0 * jnp.log10(mse)

    eval_apply = jax.jit(hk.transform_with_state(eval_fn).apply)
    eval_bs = int(args.eval_batch_size)
    n_eval = (x_test.shape[0] // eval_bs) * eval_bs
    if args.num_instances:
        n_eval = min(n_eval, (args.num_instances // eval_bs) * eval_bs)

    eval_mask_gen = get_mask_generator(config.data.mask_generator)
    eval_prng = hk.PRNGSequence(91)  # reference eval_pm_vqvae.py:157
    per_trial = []
    for trial in range(args.num_trials):
        psnrs = []
        for i in range(0, n_eval, eval_bs):
            x = x_test[i:i + eval_bs]
            b = eval_mask_gen(x.shape).astype(np.float32)
            psnr, _ = eval_apply(params, state, next(eval_prng),
                                 {"image": x, "mask": b})
            psnrs.append(np.asarray(psnr))
        psnrs = np.concatenate(psnrs)
        per_trial.append(float(np.mean(np.ma.masked_invalid(psnrs))))
        print(f"[ref eval] trial {trial + 1}/{args.num_trials}: "
              f"PSNR {per_trial[-1]:.3f}", flush=True)

    record = {
        "metric": "reference_impl_quality_pm_vqvae",
        "dataset": config.data.dataset,
        "config": args.config or "pm_vqvae_digits16",
        "steps": steps,
        "seed": args.seed,
        "num_instances": n_eval,
        "num_samples": args.num_samples,
        "num_trials": args.num_trials,
        "psnr_mean": float(np.mean(per_trial)),
        "psnr_std": float(np.std(per_trial)),
        "train_steps_per_sec": steps / secs,
        "platform": jax.default_backend(),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print("\n****REFERENCE RESULTS****")
    print(f"PSNR: {record['psnr_mean']} ± {record['psnr_std']}")
    _append_record(args.out, record)


# ---------------------------------------------------------------------------
# Stage: PM-VDVAE (reference train_pm_vdvae.py + both eval protocols)
# ---------------------------------------------------------------------------


def stage_vdvae(args):
    import math

    import haiku as hk
    import optax

    from posterior_matching.masking import RectangleMaskGenerator
    from posterior_matching.models.vdvae import PosteriorMatchingVDVAE

    config = _load_our_config(args.config or "pm_vdvae_digits16")
    model_config = {k: v for k, v in config.model.to_dict().items()
                    if k != "compute_dtype"}
    model_config["image_shape"] = tuple(model_config["image_shape"])
    steps = int(args.steps or config.steps)
    batch_size = int(config.data.train_batch_size)
    # reference train_pm_vdvae.py:107 — normalize_images=False: [0, 255]
    x_train, _, _ = _load_split(config.data.dataset, "train", normalize=False)
    x_test, _, _ = _load_split(config.data.dataset, "test", normalize=False)

    def loss_fn(batch):
        # reference train_pm_vdvae.py:109-120
        model = PosteriorMatchingVDVAE(**model_config)
        out = model(batch["image"], batch["mask"])
        elbo = jnp.mean(out["reconstruction_ll"] - out["kl"])
        return -elbo + jnp.mean(out["pm_kl"])

    transformed = hk.transform_with_state(loss_fn)

    lr = float(config.lr)
    optimizer = optax.chain(
        optax.clip_by_global_norm(float(config.gradient_clip)),
        optax.scale_by_adam(**config.get("adam", {})),
        optax.add_decayed_weights(
            config.get("weight_decay", 0.0),
            mask=lambda p: jax.tree.map(lambda x: x.ndim != 1, p)),
        optax.scale_by_schedule(lambda _: lr),
        optax.scale(-1.0),
    )
    ema_rate = float(config.get("ema_rate", 0.999))

    mask_gen = RectangleMaskGenerator()
    rng = np.random.RandomState(args.seed)

    def batch_fn(step):
        idx = rng.randint(0, x_train.shape[0], size=batch_size)
        x = x_train[idx]
        b = mask_gen(x.shape).astype(np.float32)
        return {"image": x, "mask": b}

    prng = hk.PRNGSequence(args.seed)
    params, state = transformed.init(next(prng), batch_fn(0))
    opt_state = optimizer.init(params)
    ema_params = params

    @jax.jit
    def update(params, state, opt_state, ema_params, key, step, batch):
        (loss, new_state), grads = jax.value_and_grad(
            transformed.apply, has_aux=True)(params, state, key, batch)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # reference Trainer(skip_nonfinite_updates=True): keep the old
        # params/opt state when the loss or any grad is non-finite.
        finite = jnp.isfinite(loss)
        for g in jax.tree.leaves(grads):
            finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(g)))
        new_params = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_params, params)
        new_opt_state = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_opt_state, opt_state)
        new_ema = jax.tree.map(
            lambda e, p: ema_rate * e + (1.0 - ema_rate) * p,
            ema_params, new_params)
        return new_params, new_state, new_opt_state, new_ema, loss

    params, state, _, ema_params, secs = _train_loop(
        update, params, state, opt_state, prng, steps, batch_fn,
        extra=ema_params)

    # --- eval 1: likelihoods (eval_pm_vdvae_likelihood.py protocol;
    #     use_ema_for_eval=True) ---
    def ll_fn(batch):
        model = PosteriorMatchingVDVAE(**model_config)
        return model.is_log_probs(batch["image"], batch["mask"],
                                  args.ll_num_samples)

    ll_apply = jax.jit(hk.transform_with_state(ll_fn).apply)
    eval_bs = int(args.eval_batch_size)
    n_eval = (x_test.shape[0] // eval_bs) * eval_bs
    if args.num_instances:
        n_eval = min(n_eval, (args.num_instances // eval_bs) * eval_bs)

    eval_mask_gen = RectangleMaskGenerator()
    prng_eval = hk.PRNGSequence(91)
    x_lls, xo_lls = [], []
    for trial in range(args.num_trials):
        px_t, pxo_t = [], []
        for i in range(0, n_eval, eval_bs):
            x = x_test[i:i + eval_bs]
            b = eval_mask_gen(x.shape).astype(np.float32)
            (px, pxo), _ = ll_apply(ema_params, state, next(prng_eval),
                                    {"image": x, "mask": b})
            px_t.append(np.asarray(px))
            pxo_t.append(np.asarray(pxo))
        x_lls.append(np.concatenate(px_t))
        xo_lls.append(np.concatenate(pxo_t))
        print(f"[ref ll eval] trial {trial + 1}/{args.num_trials} done",
              flush=True)
    x_lls = np.array(x_lls)
    xo_lls = np.array(xo_lls)
    bpd = -x_lls / (math.prod(model_config["image_shape"]) * np.log(2))
    ac_lls = x_lls - xo_lls
    # the reference's non-finite masking (eval_pm_vdvae_likelihood.py:205-216)
    bpd = np.ma.masked_array(
        bpd, mask=(~np.isfinite(bpd)) | (bpd > 1e10) | (bpd < -1e10))
    ac_lls = np.ma.masked_array(
        ac_lls, mask=(~np.isfinite(ac_lls)) | (ac_lls > 1e10) | (ac_lls < -1e10))
    per_trial_bpd = np.mean(bpd, axis=1)
    per_trial_ac = np.mean(ac_lls, axis=1)

    # --- eval 2: imputation PSNR (our BASELINE protocol: PSNR on the
    #     [0,1]-rescaled mean imputation, eval_pm_vdvae_imputation.py) ---
    def impute_fn(batch):
        model = PosteriorMatchingVDVAE(**model_config)
        imputations = model.impute(batch["image"], batch["mask"],
                                   num_samples=args.num_samples)
        mean_imp = jnp.mean(imputations, axis=1) / 255.0
        mse = jnp.mean((mean_imp - batch["image"] / 255.0) ** 2,
                       axis=(1, 2, 3))
        return -10.0 * jnp.log10(mse)

    imp_apply = jax.jit(hk.transform_with_state(impute_fn).apply)
    per_trial_psnr = []
    for trial in range(args.num_trials):
        psnrs = []
        for i in range(0, n_eval, eval_bs):
            x = x_test[i:i + eval_bs]
            b = eval_mask_gen(x.shape).astype(np.float32)
            psnr, _ = imp_apply(ema_params, state, next(prng_eval),
                                {"image": x, "mask": b})
            psnrs.append(np.asarray(psnr))
        psnrs = np.concatenate(psnrs)
        per_trial_psnr.append(float(np.mean(np.ma.masked_invalid(psnrs))))
        print(f"[ref imp eval] trial {trial + 1}/{args.num_trials}: "
              f"PSNR {per_trial_psnr[-1]:.3f}", flush=True)

    record = {
        "metric": "reference_impl_quality_pm_vdvae",
        "dataset": config.data.dataset,
        "config": args.config or "pm_vdvae_digits16",
        "steps": steps,
        "seed": args.seed,
        "num_instances": n_eval,
        "ll_num_samples": args.ll_num_samples,
        "imp_num_samples": args.num_samples,
        "num_trials": args.num_trials,
        "bpd_mean": float(np.mean(per_trial_bpd)),
        "bpd_std": float(np.std(per_trial_bpd)),
        "ac_ll_mean": float(np.mean(per_trial_ac)),
        "ac_ll_std": float(np.std(per_trial_ac)),
        "psnr_mean": float(np.mean(per_trial_psnr)),
        "psnr_std": float(np.std(per_trial_psnr)),
        "train_steps_per_sec": steps / secs,
        "platform": jax.default_backend(),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print("\n****REFERENCE RESULTS****")
    print(f"BPD: {record['bpd_mean']} ± {record['bpd_std']}")
    print(f"AC LL: {record['ac_ll_mean']} ± {record['ac_ll_std']}")
    print(f"PSNR: {record['psnr_mean']} ± {record['psnr_std']}")
    _append_record(args.out, record)


# ---------------------------------------------------------------------------
# Stage: VaDE (reference train_vade.py, 3 phases)
# ---------------------------------------------------------------------------


def stage_vade(args):
    import haiku as hk
    import optax
    from sklearn.mixture import GaussianMixture

    from posterior_matching.clustering import clustering_accuracy
    from posterior_matching.models.vade import VADE

    config = _load_our_config(args.config or "vade_digits")
    model_config = config.model.to_dict()
    batch_size = int(config.data.train_batch_size)
    pretrain_steps = int(args.pretrain_steps or config.pretrain_steps)
    steps = int(args.steps or config.steps)
    validation_freq = int(config.validation_freq)
    x_train, y_train, key = _load_split(config.data.dataset, "train",
                                        normalize=True)
    x_val, y_val, _ = _load_split(config.data.dataset, "val", normalize=True)

    rng = np.random.RandomState(args.seed)
    prng = hk.PRNGSequence(args.seed)

    def batch_fn(step):
        idx = rng.randint(0, x_train.shape[0], size=batch_size)
        return {key: x_train[idx]}

    # --- phase 1: autoencoder pretrain (reference train_vade.py:44-48) ---
    def pretrain_loss(batch):
        model = VADE.from_config(model_config)
        z = model.encoder(batch[key]).mean()
        return -jnp.mean(model.decoder(z).log_prob(batch[key]))

    pre_t = hk.transform_with_state(pretrain_loss)
    pre_opt = optax.adam(float(config.pretrain_lr))
    params, state = pre_t.init(next(prng), batch_fn(0))
    opt_state = pre_opt.init(params)

    @jax.jit
    def pre_update(params, state, opt_state, rng_key, step, batch):
        (loss, new_state), grads = jax.value_and_grad(
            pre_t.apply, has_aux=True)(params, state, rng_key, batch)
        updates, opt_state = pre_opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state, opt_state, loss

    print("Pretraining...")
    params, state, _, _, _ = _train_loop(
        pre_update, params, state, opt_state, prng, pretrain_steps, batch_fn)

    # --- phase 2: sklearn GMM graft (reference train_vade.py:84-125) ---
    def encode_fn(batch):
        model = VADE.from_config(model_config)
        return model.encoder(batch[key]).mean()

    enc_apply = jax.jit(hk.transform_with_state(encode_fn).apply)

    def encode_all(x):
        outs = []
        for i in range(0, x.shape[0], 256):
            z, _ = enc_apply(params, state, next(prng), {key: x[i:i + 256]})
            outs.append(np.asarray(z))
        return np.concatenate(outs)

    print("Fitting GMM...")
    latents = encode_all(x_train)
    val_latents = encode_all(x_val)
    gmm = GaussianMixture(
        n_components=int(model_config["num_components"]),
        covariance_type="diag", max_iter=300, n_init=10,
        random_state=args.seed)
    gmm.fit(latents)
    gmm_acc = clustering_accuracy(y_val, gmm.predict(val_latents))
    print("GMM Accuracy:", round(float(gmm_acc), 4))

    # the reference grafts log(cov) into log_scale (train_vade.py:115-121);
    # the VADE prior then uses scale_diag=exp(log_scale)=cov — reproduced
    # as-is (the quirk is part of the reference's behavior).
    gmm_params = {"vade": {
        "logits": jnp.asarray(np.log(gmm.weights_), jnp.float32),
        "mu": jnp.asarray(gmm.means_, jnp.float32),
        "log_scale": jnp.asarray(np.log(gmm.covariances_), jnp.float32),
    }}
    params = hk.data_structures.merge(params, gmm_params)

    # --- phase 3: ELBO training with the clustering callback ---
    def elbo_loss(batch):
        model = VADE.from_config(model_config)
        return -jnp.mean(model.elbo(batch[key]))

    elbo_t = hk.transform_with_state(elbo_loss)

    def pred_fn(batch):
        model = VADE.from_config(model_config)
        probs = model.predict_cluster(
            batch[key], int(config.cluster_pred_num_samples))
        return jnp.argmax(probs, axis=-1)

    pred_apply = jax.jit(hk.transform_with_state(pred_fn).apply)

    schedule = optax.exponential_decay(**config.lr_schedule.to_dict())
    optimizer = optax.chain(
        optax.scale_by_adam(**config.get("adam", {})),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    )
    # phase-3 re-init would clobber the pretrained params; the reference
    # passes them as initial_params (train_vade.py:152-159)
    p2, s2 = elbo_t.init(next(prng), batch_fn(0))
    params = hk.data_structures.merge(p2, params)
    state = hk.data_structures.merge(s2, state)
    opt_state = optimizer.init(params)

    @jax.jit
    def update(params, state, opt_state, rng_key, step, batch):
        (loss, new_state), grads = jax.value_and_grad(
            elbo_t.apply, has_aux=True)(params, state, rng_key, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state, opt_state, loss

    def val_acc():
        preds = []
        for i in range(0, x_val.shape[0], 256):
            pr, _ = pred_apply(params, state, next(prng),
                               {key: x_val[i:i + 256]})
            preds.append(np.asarray(pr))
        return float(clustering_accuracy(y_val, np.concatenate(preds)))

    print("Starting main training...")
    best_acc, accs = 0.0, []
    t0 = time.perf_counter()
    for step in range(steps):
        batch = batch_fn(step)
        params, state, opt_state, loss = update(
            params, state, opt_state, next(prng), np.int32(step), batch)
        if (step + 1) % validation_freq == 0:
            acc = val_acc()
            accs.append(acc)
            best_acc = max(best_acc, acc)
            print(f"[ref vade {step + 1}/{steps}] loss={float(loss):.4f} "
                  f"acc={acc:.4f}", flush=True)
    secs = time.perf_counter() - t0
    final_acc = accs[-1] if accs else val_acc()

    record = {
        "metric": "reference_impl_quality_vade",
        "dataset": config.data.dataset,
        "config": args.config or "vade_digits",
        "pretrain_steps": pretrain_steps,
        "steps": steps,
        "seed": args.seed,
        "gmm_fit_acc": float(gmm_acc),
        "best_val_acc": float(best_acc),
        "final_acc": float(final_acc),
        "train_steps_per_sec": steps / secs,
        "platform": jax.default_backend(),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print("\n****REFERENCE RESULTS****")
    print(f"Clustering acc: GMM-fit {record['gmm_fit_acc']:.4f} / "
          f"best-val {record['best_val_acc']:.4f} / "
          f"final {record['final_acc']:.4f}")
    _append_record(args.out, record)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["vqvae", "pm_vqvae", "vdvae", "vade"])
    ap.add_argument("--config", default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--pretrain_steps", type=int, default=None)
    ap.add_argument("--eval_batch_size", type=int, default=32)
    ap.add_argument("--num_instances", type=int, default=None)
    ap.add_argument("--num_samples", type=int, default=10,
                    help="Imputation samples (PSNR protocols).")
    ap.add_argument("--ll_num_samples", type=int, default=200,
                    help="IS samples for the VDVAE likelihood protocol.")
    ap.add_argument("--num_trials", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir",
                    default=os.path.join(REPO_ROOT, "runs",
                                         "ref-quality-images"))
    ap.add_argument("--out", default=os.path.join(REPO_ROOT,
                                                  "REFERENCE_QUALITY.json"))
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    {"vqvae": stage_vqvae, "pm_vqvae": stage_pm_vqvae,
     "vdvae": stage_vdvae, "vade": stage_vade}[args.stage](args)


if __name__ == "__main__":
    main()
