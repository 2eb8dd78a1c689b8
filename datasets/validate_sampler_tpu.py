"""On-chip validation + timing of the Pallas per-row sampler kernel.

Compares the kernel sampler (ops/sampler_chain.py) against the cached XLA
sampler (models/pixelcnn_fast.py) at the eval-protocol flagship shapes
(16x16 code grid, 512 indices, 12 gated levels, 128 filters, batch 32 x 10
imputation samples), same PRNG key — the noise sequences are identical by
construction, so f32 agreement should be ~100% (bit-level logits ties only)
and bf16 agreement high.  Timings are value-fetch synced (bench.py::_sync
rationale: block_until_ready is not a fence through the axon tunnel).

Run alone on the TPU (one process per lease):
    timeout 3600 python datasets/validate_sampler_tpu.py
"""
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from posterior_matching_tpu.models.pixelcnn import PixelCNN
from posterior_matching_tpu.models.pixelcnn_fast import pixelcnn_sample_fast
from posterior_matching_tpu.ops.sampler_chain import (
    pixelcnn_sample_rowkernel,
)
from posterior_matching_tpu.runtime import configure_environment


def main():
    configure_environment()
    print("platform:", jax.default_backend(), jax.devices())

    model = PixelCNN(
        num_indices=512, image_shape=(16, 16), dropout=0.5,
        num_resnet=12, num_hierarchies=1, num_filters=128,
    )
    batch, num_samples = 32, 10
    cond = jax.random.normal(jax.random.PRNGKey(7), (batch, 512))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((batch, 16, 16), jnp.int32), cond
    )
    params = variables["params"]
    key = jax.random.PRNGKey(3)

    def timed(tag, fn, reps=3):
        t0 = time.perf_counter()
        out = fn(key, cond)
        s = int(jnp.sum(out))  # value-fetch sync
        print(f"{tag}: first call (compile) {time.perf_counter()-t0:.1f}s "
              f"(checksum {s})", flush=True)
        t0 = time.perf_counter()
        for i in range(reps):
            out = fn(key, cond)
            int(jnp.sum(out))
        dt = (time.perf_counter() - t0) / reps
        gps = batch * num_samples / dt
        print(f"{tag}: {dt*1e3:.1f} ms/batch = {gps:.0f} grids/s", flush=True)
        return np.asarray(out), dt, gps

    results = {}

    kern_bf16 = jax.jit(lambda k, c: pixelcnn_sample_rowkernel(
        model, params, k, num_samples, conditional_input=c,
        compute_dtype="bfloat16",
    ))
    s_bf16, dt, gps = timed("kernel bf16", kern_bf16)
    results["kernel_bf16_grids_per_sec"] = gps

    fast = jax.jit(lambda k, c: pixelcnn_sample_fast(
        model, params, k, num_samples, conditional_input=c
    ))
    s_fast, dt, gps = timed("fast xla f32", fast)
    results["fast_grids_per_sec"] = gps

    agree = float(np.mean(s_fast == s_bf16))
    print(f"bf16-vs-fast same-noise agreement: {agree:.4f}", flush=True)
    results["bf16_agreement"] = agree

    if os.environ.get("PM_SAMPLER_VAL_ONLY") != "bf16":
        kern_f32 = jax.jit(lambda k, c: pixelcnn_sample_rowkernel(
            model, params, k, num_samples, conditional_input=c,
            compute_dtype="float32",
        ))
        s_f32, dt, gps = timed("kernel f32", kern_f32)
        results["kernel_f32_grids_per_sec"] = gps
        agree32 = float(np.mean(s_fast == s_f32))
        print(f"f32-vs-fast same-noise agreement: {agree32:.4f}", flush=True)
        results["f32_agreement"] = agree32

    results["speedup_bf16_vs_fast"] = round(
        results["kernel_bf16_grids_per_sec"] / results["fast_grids_per_sec"],
        3,
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
