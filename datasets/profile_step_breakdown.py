"""Component breakdown of the flagship PM-VQVAE CelebA train step (bf16).

Times, on the real chip, separately-jitted pieces of the fused step from
bench.py (same model/config/shapes) to locate the remaining milliseconds:

    mask       on-device CelebA mixture mask generation alone
    vq_encode  frozen VQ-VAE encode -> code indices (incl. codebook search)
    loss_fwd   full loss forward (partial-encoder + PixelCNN log_prob)
    grad       value_and_grad of the loss (no optimizer)
    full       the complete fused step (mask + grad + adam update)

Each timing is a separate XLA program, so boundaries prevent cross-piece
fusion; the pieces therefore OVERESTIMATE their fused in-step cost slightly
(extra HBM round-trips at the cut points). The deltas still rank targets.

Run: python datasets/profile_step_breakdown.py  (one TPU process at a time)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: build())


def main():
    import jax
    import jax.numpy as jnp

    (
        jax_, jnp_, model, mask_fn, images, params, state, opt_state,
        fused_step, fused_chunk, naive_step,
    ) = bench.build(compute_dtype="bfloat16")

    from posterior_matching_tpu.utils import fast_bits_key

    x = jnp.asarray(images)
    key = jax.random.PRNGKey(0)
    k_drop = fast_bits_key(jax.random.PRNGKey(1))
    b0 = mask_fn(key, x.shape).reshape((*x.shape[:-1], 1))

    def timeit(name, fn, *args, n=50):
        out = fn(*args)
        bench._sync(jax, jnp, out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        bench._sync(jax, jnp, out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:12s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    # mask generation alone
    mask_jit = jax.jit(
        lambda k: mask_fn(k, (x.shape[0], 64, 64, 3)).reshape(
            (x.shape[0], 64, 64, 1)
        )
    )
    timeit("mask", mask_jit, key)

    # frozen VQ-VAE encode -> code indices (incl. nearest-codebook search)
    def vq_encode(params, state, x):
        return model.apply(
            {"params": params, **state}, x,
            method=lambda m, x: m.vqvae.encoding_indices(x),
        )

    timeit("vq_encode", jax.jit(vq_encode), params, state, x)

    # partial encoder -> conditional latents
    def cond_lat(params, state, x, b):
        return model.apply(
            {"params": params, **state}, x, b,
            method=lambda m, x, b: m.conditional_latents(x, b),
        )

    timeit("cond_latents", jax.jit(cond_lat), params, state, x, b0)

    # loss forward
    def loss_fwd(params, state, x, b, k):
        ll, _ = model.apply(
            {"params": params, **state}, x, b, training=True,
            rngs={"dropout": k}, mutable=["vq_ema"],
        )
        return -jnp.mean(ll)

    timeit("loss_fwd", jax.jit(loss_fwd), params, state, x, b0, k_drop)

    # grad (no optimizer)
    timeit(
        "grad", jax.jit(jax.grad(loss_fwd)), params, state, x, b0, k_drop
    )

    # full fused step, timed via the chunked program (bench._time_fused)
    sps = bench._time_fused(
        jax, jnp, params, state, opt_state, fused_chunk, images,
        3, steps_per_call=bench.CHUNK,
    )
    print(f"{'full(chunk)':12s} {1e3/sps:8.3f} ms  ({sps:.2f} steps/s)",
          flush=True)


if __name__ == "__main__":
    main()
