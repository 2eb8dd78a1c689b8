"""Capture a device trace of the flagship PM-VQVAE bf16 train step.

Runs the same scan-chunked step as ``bench.py``'s primary variant under
``jax.profiler.trace`` and writes the trace to ``/tmp/pm_trace_flagship``
(or argv[1]); analyze with::

    python datasets/profile_analysis.py /tmp/pm_trace_flagship --top 25

Run: python datasets/profile_trace_flagship.py  (one TPU process at a time)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: build())


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pm_trace_flagship"

    import jax
    import jax.numpy as jnp

    # PM_PROFILE_PACKED=0 to trace the canonical (non-packed) variant.
    packed = os.environ.get("PM_PROFILE_PACKED", "1") != "0"
    (
        jax_, jnp_, model, mask_fn, images, params, state, opt_state,
        fused_step, fused_chunk, naive_step,
    ) = bench.build(compute_dtype="bfloat16", packed=packed)

    key = jax.random.PRNGKey(0)
    x = jnp.asarray(images)
    p = jax.tree.map(jnp.copy, params)
    o = jax.tree.map(jnp.copy, opt_state)
    for _ in range(2):  # compile + warm
        p, o, key = fused_chunk(p, o, state, x, key)
    bench._sync(jax, jnp, p)

    jax.profiler.start_trace(out_dir)
    t0 = time.perf_counter()
    for _ in range(3):  # 3 dispatches x CHUNK steps
        p, o, key = fused_chunk(p, o, state, x, key)
    bench._sync(jax, jnp, p)
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    sps = 3 * bench.CHUNK / dt
    print(f"traced {3 * bench.CHUNK} steps at {sps:.1f} steps/s -> {out_dir}",
          flush=True)


if __name__ == "__main__":
    main()
