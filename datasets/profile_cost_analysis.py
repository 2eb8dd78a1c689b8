"""Compiled-program cost analysis + precise timing of the flagship step.

Round-3 ground truth: the round-2 roadmap quoted ~115 GFLOP/step fwd+bwd for
the PM-VQVAE CelebA step; a hand count of the conv matmuls
(48 gated blocks x [8192, 6*256] x [*, F] ...) suggests ~1.2 TFLOP.  The
factor-10 question decides whether the megakernel's headroom is ~3x (launch
overhead dominated) or ~1.4x (already near the MXU roofline), so measure it
from the compiled HLO instead of arguing.

Prints: XLA cost_analysis flops/bytes for (a) the fused train step and
(b) grad-only, plus value-fetch-synced timings, plus the implied MXU
utilization at v5e bf16 peak (197 TFLOPS).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench

    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    (
        jax_, jnp_, model, mask_fn, images, params, state, opt_state,
        fused_step, fused_chunk, naive_step,
    ) = bench.build(compute_dtype=None if dtype == "f32" else dtype)

    key = jax.random.PRNGKey(0)
    x_dev = jnp.asarray(images)

    # --- cost analysis of the single fused step ---------------------------
    lowered = fused_step.lower(params, opt_state, state, x_dev, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))
    print(json.dumps({
        "program": "fused_step",
        "flops": flops,
        "gflops": flops / 1e9,
        "bytes_accessed": bytes_acc,
        "GB": bytes_acc / 1e9,
    }))

    # grad-only (no optimizer/mask) for the same loss
    import functools

    from posterior_matching_tpu.utils import fast_bits_key

    def loss(params, state, x, b, key):
        ll, _ = model.apply(
            {"params": params, **state}, x, b, training=True,
            rngs={"dropout": key}, mutable=["vq_ema"],
        )
        return -jnp.mean(ll)

    b0 = mask_fn(jax.random.PRNGKey(1), x_dev.shape).reshape(
        (*x_dev.shape[:-1], 1)
    )
    kd = fast_bits_key(jax.random.PRNGKey(2)) if jax.default_backend() == "tpu" else jax.random.PRNGKey(2)
    grad_fn = jax.jit(jax.grad(loss))
    gl = grad_fn.lower(params, state, x_dev, b0, kd).compile()
    gca = gl.cost_analysis()
    if isinstance(gca, list):
        gca = gca[0]
    print(json.dumps({
        "program": "grad_only",
        "gflops": gca.get("flops", float("nan")) / 1e9,
        "GB": gca.get("bytes accessed", float("nan")) / 1e9,
    }))

    # fwd-only loss
    fwd_fn = jax.jit(loss)
    fl = fwd_fn.lower(params, state, x_dev, b0, kd).compile()
    fca = fl.cost_analysis()
    if isinstance(fca, list):
        fca = fca[0]
    print(json.dumps({
        "program": "fwd_only",
        "gflops": fca.get("flops", float("nan")) / 1e9,
        "GB": fca.get("bytes accessed", float("nan")) / 1e9,
    }))

    # --- timings (value-fetch synced) -------------------------------------
    def sync(v):
        return float(jnp.sum(jax.tree.leaves(v)[0]))

    # grad-only timing
    g = grad_fn(params, state, x_dev, b0, kd)
    sync(g)
    t0 = time.perf_counter()
    N = 30
    for _ in range(N):
        g = grad_fn(params, state, x_dev, b0, kd)
    sync(g)
    t_grad = (time.perf_counter() - t0) / N
    # fwd-only timing
    v = fwd_fn(params, state, x_dev, b0, kd)
    sync(v)
    t0 = time.perf_counter()
    for _ in range(N):
        v = fwd_fn(params, state, x_dev, b0, kd)
    sync(v)
    t_fwd = (time.perf_counter() - t0) / N

    # full fused step timing
    p = jax.tree.map(jnp.copy, params)
    o = jax.tree.map(jnp.copy, opt_state)
    for _ in range(2):
        p, o, key = fused_step(p, o, state, x_dev, key)
    sync(p)
    t0 = time.perf_counter()
    for _ in range(N):
        p, o, key = fused_step(p, o, state, x_dev, key)
    sync(p)
    t_step = (time.perf_counter() - t0) / N

    peak = 197e12 if dtype == "bfloat16" else 98.5e12  # v5e bf16 / f32(=bf16x? use half)
    print(json.dumps({
        "dtype": dtype,
        "t_fwd_ms": t_fwd * 1e3,
        "t_grad_ms": t_grad * 1e3,
        "t_step_ms": t_step * 1e3,
        "steps_per_sec": 1.0 / t_step,
        "grad_gflops": gca.get("flops", 0) / 1e9,
        "grad_mxu_util_at_bf16_peak": (gca.get("flops", 0) / t_grad) / 197e12,
        "step_mxu_util_at_bf16_peak": (ca.get("flops", 0) / t_step) / 197e12,
    }))


if __name__ == "__main__":
    main()
