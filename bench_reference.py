"""Measures the REFERENCE implementation's own train-step throughput.

The north-star ratio (BASELINE.json) is "our steps/sec/chip vs the
*reference implementation's*" — a denominator that round 1 never measured
(VERDICT "What's weak" #7: the baseline in ``bench.py`` is a
reference-*style* pipeline running OUR model). This harness closes that gap
by running the reference's actual code: the reference repo is pure JAX
(haiku + tfp/distrax + the external ``bax`` trainer), so its models execute
unmodified over the textbook shims in ``tests/refshims`` on any backend,
including the same TPU chip ``bench.py`` measures.

What runs (all reference code, cited):

- model forward: ``VQVAE(**vqvae_config)(image)["vq_output"]["encoding_indices"]``
  + ``VQVAEPartialEncoder`` + ``PixelCNN.log_prob`` exactly as the reference
  PM-VQVAE loss builds them (reference train_pm_vqvae.py:81-99), with the
  reference's configs (reference configs/pm_vqvae_celeb_a.py,
  configs/vqvae_celeb_a.py).
- update semantics: ``bax`` is external and unpublished here, so its
  documented behavior is reproduced (SURVEY.md L2): one jitted
  ``value_and_grad`` over the trainable partition
  (``trainable_predicate = not module_name.startswith("vqvae/")``,
  reference train_pm_vqvae.py:122-123, via ``hk.data_structures.partition``)
  + the reference's optax chain (train_pm_vqvae.py:115-120).
- input pipeline behavior: per-batch host-side numpy mask generation
  (the reference's ``tf.py_function`` callback, reference masking.py:342,
  here the generator called directly — same work, same process) and a
  host->device transfer of the numpy batch every step, one dispatch per
  step (the reference feeds the jitted update from a tf.data numpy
  iterator; SURVEY.md §3.1).

Images are synthetic (uniform bytes /255 at CelebA shapes): throughput does
not depend on pixel values, and real CelebA is not downloadable here.

Usage:
    python bench_reference.py [--steps 100] [--warmup 10] [--out FILE]
    PM_TPU_PLATFORM=cpu python bench_reference.py --steps 5   # CPU check

Prints one JSON line:
    {"metric": "reference_train_steps_per_sec", "value": ..., ...}
and appends it to BENCH_REFERENCE.json (incremental, crash-safe).
"""
import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

from posterior_matching_tpu.runtime import configure_environment

configure_environment()

REFERENCE_ROOT = "/root/reference"
SHIM_ROOT = os.path.join(os.path.dirname(__file__), "tests", "refshims")

for _p in (SHIM_ROOT, REFERENCE_ROOT):
    if _p not in sys.path:
        sys.path.append(_p)

import jax
import jax.numpy as jnp


def _load_reference_config(name):
    """Loads ``get_config()`` from a reference config file by path."""
    path = os.path.join(REFERENCE_ROOT, "configs", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"ref_config_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.get_config()


def _sync(v):
    """Fetches a value: the only reliable fence through the axon tunnel."""
    return float(jnp.sum(jax.tree.leaves(v)[0]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--out", default="BENCH_REFERENCE.json")
    args = ap.parse_args()

    import haiku as hk
    import optax

    from posterior_matching.masking import get_mask_generator
    from posterior_matching.models.pixel_cnn import PixelCNN
    from posterior_matching.models.vqvae import VQVAE, VQVAEPartialEncoder

    config = _load_reference_config("pm_vqvae_celeb_a")
    vqvae_config = dict(_load_reference_config("vqvae_celeb_a").model)
    config.pixel_cnn.num_indices = vqvae_config["num_embeddings"]
    batch_size = int(config.data.train_batch_size)

    # Reference loss (train_pm_vqvae.py:81-99), is_training=True.
    def loss_fn(batch):
        vqvae = VQVAE(**vqvae_config)
        partial_encoder = VQVAEPartialEncoder(
            config.conditional_dim, vqvae_config
        )
        partial_posterior = PixelCNN(**config.pixel_cnn)
        encoding_indices = vqvae(batch["image"])["vq_output"][
            "encoding_indices"
        ]
        x_o_b = jnp.concatenate(
            [batch["image"] * batch["mask"], batch["mask"]], axis=-1
        )
        cond_latents = partial_encoder(x_o_b)
        return -jnp.mean(
            partial_posterior.log_prob(
                encoding_indices,
                training=True,
                conditional_input=cond_latents,
            )
        )

    transformed = hk.transform_with_state(loss_fn)

    # Reference optimizer chain (train_pm_vqvae.py:115-120).
    schedule = optax.exponential_decay(**config.lr_schedule)
    optimizer = optax.chain(
        optax.scale_by_adam(),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    )

    def trainable_predicate(module_name, name, value):
        return not module_name.startswith("vqvae/")

    rng = np.random.RandomState(0)
    image0 = rng.randint(0, 256, (batch_size, 64, 64, 3)).astype(
        np.float32
    ) / 255.0
    mask_generator = get_mask_generator(config.data.mask_generator)

    def host_batch():
        # The per-step host work of the reference pipeline: numpy mask
        # sampling (masking.py:342's py_function body) + the numpy batch
        # that crosses to the device on dispatch.
        mask = np.asarray(
            mask_generator((batch_size, 64, 64, 3)), np.float32
        ).reshape(batch_size, 64, 64, 1)
        return {"image": image0, "mask": mask}

    t0 = time.time()
    params, state = transformed.init(jax.random.PRNGKey(0), host_batch())
    trainable, frozen = hk.data_structures.partition(
        trainable_predicate, params
    )
    opt_state = optimizer.init(trainable)
    print(
        f"init ok ({time.time() - t0:.1f}s); "
        f"trainable modules: {len(trainable)}, frozen: {len(frozen)}",
        flush=True,
    )

    @jax.jit
    def update(trainable, frozen, state, opt_state, key, batch):
        def loss_of(tr):
            merged = hk.data_structures.merge(tr, frozen)
            loss, new_state = transformed.apply(merged, state, key, batch)
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_of, has_aux=True)(
            trainable
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, trainable)
        return (
            optax.apply_updates(trainable, updates),
            new_state,
            new_opt_state,
            loss,
        )

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(args.warmup):
        key, sub = jax.random.split(key)
        trainable, state, opt_state, loss = update(
            trainable, frozen, state, opt_state, sub, host_batch()
        )
    _sync(loss)
    print(
        f"compile+warmup ok ({time.time() - t0:.1f}s); "
        f"loss={_sync(loss):.4f}",
        flush=True,
    )

    t0 = time.perf_counter()
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        trainable, state, opt_state, loss = update(
            trainable, frozen, state, opt_state, sub, host_batch()
        )
    _sync(loss)
    dt = time.perf_counter() - t0
    steps_per_sec = args.steps / dt

    record = {
        "metric": "reference_train_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "workload": "pm_vqvae_celeb_a (reference code, synthetic images)",
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "batch_size": batch_size,
        "steps": args.steps,
        "final_loss": _sync(loss),
    }
    print(json.dumps(record), flush=True)
    try:
        existing = json.load(open(args.out))
        if not isinstance(existing, list):
            existing = [existing]
    except (FileNotFoundError, json.JSONDecodeError):
        existing = []
    existing.append(record)
    with open(args.out, "w") as fp:
        json.dump(existing, fp, indent=1)


if __name__ == "__main__":
    main()
