"""Benchmark: PM-VQVAE CelebA training steps/sec/chip (the north-star metric,
BASELINE.md).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``value`` is the steady-state optimizer steps/sec of our best fused pipeline
on the reference's PM-VQVAE CelebA workload shape
(configs/pm_vqvae_celeb_a.py: 64x64x3 images, batch 32, 16x16 code grid, 12
gated resnet blocks, 128 filters, codebook 512). Four framework variants are
measured and the best reported: {f32, bf16 conv stacks} x {one dispatch per
step, scan-fused 20-step chunks (the Trainer's steps_per_call/DeviceDataset
execution mode — device-resident data, on-device masks, one dispatch per
chunk)}.

``vs_baseline`` is measured, not assumed: the same model stepped the way the
reference's input pipeline works — per-batch host-side numpy mask generation
(reference masking.py:342 tf.py_function) + host->device transfer + one
dispatch each step — on the same chip. The ratio is the end-to-end win of
moving the input pipeline into the XLA program.
"""
import functools
import json
import time

import numpy as np


def build(compute_dtype=None):
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
    model = PMVQVAE.from_config(
        512, vqvae_config, pixel_cnn_config, compute_dtype=compute_dtype
    )
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

    # Matches the Trainer's default rng_impl="auto": the dropout key is
    # converted to the hardware rbg impl on TPU (threefry bit generation is
    # pure VPU ALU work, ~7 ms/step at these shapes — measured, BASELINE.md);
    # mask keys stay threefry (measured equal).
    from posterior_matching_tpu.utils import fast_bits_key

    use_rbg = jax.default_backend() == "tpu"

    def fused_body(params, opt_state, state, images, key):
        key, k_mask, k_drop = jax.random.split(key, 3)
        if use_rbg:
            k_drop = fast_bits_key(k_drop)
        b = mask_fn(k_mask, images.shape).reshape(
            (*images.shape[:-1], 1)
        )
        g = jax.grad(loss)(params, state, images, b, k_drop)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, key

    fused_step = jax.jit(fused_body, donate_argnums=(0, 1))

    # Scan-fused: CHUNK optimizer steps per dispatched program — the
    # framework's Trainer(steps_per_call=...) + DeviceDataset execution mode.
    # Possible only because masks are generated on device; the reference's
    # host mask callback forces one dispatch (and transfer) per step.
    CHUNK = 20

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fused_chunk(params, opt_state, state, images, key):
        def body(carry, _):
            p, o, k = carry
            return fused_body(p, o, state, images, k), None

        (params, opt_state, key), _ = jax.lax.scan(
            body, (params, opt_state, key), None, length=CHUNK
        )
        return params, opt_state, key

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def naive_step(params, opt_state, state, images, b, key):
        key, k_drop = jax.random.split(key)
        g = jax.grad(loss)(params, state, images, b, k_drop)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, key

    return (
        jax, jnp, model, mask_fn, images, params, state, opt_state,
        fused_step, fused_chunk, CHUNK, naive_step,
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


def _sync(jax, jnp, tree):
    """Forces completion by FETCHING A VALUE. ``block_until_ready`` is not a
    reliable fence on remote/tunneled backends (measured: it returned in
    0.04s where the actual device work took 34s) — only a value round trip
    proves the computation ran."""
    return float(jnp.sum(jax.tree.leaves(tree)[0]))


def _time_fused(
    jax, jnp, params, state, opt_state, step_fn, images, n, steps_per_call=1
):
    """Times ``n`` dispatches of ``step_fn`` (each = ``steps_per_call``
    optimizer steps); returns optimizer steps/sec. Synced by value fetch."""
    key = jax.random.PRNGKey(0)
    x_dev = jnp.asarray(images)
    p = jax.tree.map(jnp.copy, params)  # steps donate their inputs
    o = jax.tree.map(jnp.copy, opt_state)
    for _ in range(2):  # warmup/compile
        p, o, key = step_fn(p, o, state, x_dev, key)
    _sync(jax, jnp, p)
    t0 = time.perf_counter()
    for _ in range(n):
        p, o, key = step_fn(p, o, state, x_dev, key)
    _sync(jax, jnp, p)
    return n * steps_per_call / (time.perf_counter() - t0)


def main():
    import jax
    import jax.numpy as jnp

    n = 30

    # ---- fused pipeline, f32 ----
    (
        jax_, jnp_, model, mask_fn, images, params, state, opt_state,
        fused_step, fused_chunk, chunk, naive_step,
    ) = build()
    fused_f32_sps = _time_fused(
        jax, jnp, params, state, opt_state, fused_step, images, n
    )

    # ---- reference-style host pipeline (f32, host masks each step) ----
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    p = jax.tree.map(jnp.copy, params)
    o = jax.tree.map(jnp.copy, opt_state)
    for _ in range(2):
        b = jnp.asarray(host_masks(images.shape, rng))
        x = jnp.asarray(images + rng.rand(*images.shape).astype(np.float32) * 0)
        p, o, key = naive_step(p, o, state, x, b, key)
    _sync(jax, jnp, p)
    t0 = time.perf_counter()
    for _ in range(n):
        b = jnp.asarray(host_masks(images.shape, rng))
        x = jnp.asarray(images.copy())  # fresh host batch each step
        p, o, key = naive_step(p, o, state, x, b, key)
    _sync(jax, jnp, p)
    naive_sps = n / (time.perf_counter() - t0)

    # ---- fused pipeline, bf16 conv stacks (params/heads stay f32) ----
    (
        _, _, _, _, _, params16, state16, opt16,
        fused_step16, fused_chunk16, chunk16, _,
    ) = build(compute_dtype="bfloat16")
    fused_bf16_sps = _time_fused(
        jax, jnp, params16, state16, opt16, fused_step16, images, n
    )

    # ---- scan-fused chunks (Trainer steps_per_call mode), bf16 ----
    chunked_bf16_sps = _time_fused(
        jax, jnp, params16, state16, opt16, fused_chunk16, images,
        max(n // chunk16, 3), steps_per_call=chunk16,
    )
    chunked_f32_sps = _time_fused(
        jax, jnp, params, state, opt_state, fused_chunk, images,
        max(n // chunk, 3), steps_per_call=chunk,
    )

    fused_sps = max(
        fused_f32_sps, fused_bf16_sps, chunked_f32_sps, chunked_bf16_sps
    )
    print(
        json.dumps(
            {
                "metric": "pm_vqvae_celeba_train_steps_per_sec_per_chip",
                "value": round(fused_sps, 4),
                "unit": "steps/sec",
                "vs_baseline": round(fused_sps / naive_sps, 4),
                "fused_f32_steps_per_sec": round(fused_f32_sps, 4),
                "fused_bf16_steps_per_sec": round(fused_bf16_sps, 4),
                "chunked_f32_steps_per_sec": round(chunked_f32_sps, 4),
                "chunked_bf16_steps_per_sec": round(chunked_bf16_sps, 4),
                "host_masking_steps_per_sec": round(naive_sps, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
