"""On-TPU equality + microbench of the Pallas VQ codebook search vs the XLA
matmul+argmin path at the flagship shape (N=8192, K=512, D=64).

The XLA path is the shipped default (measured winner: 1019 us vs 1488 us,
BASELINE.md round-2 item 6); the Pallas tile kernel stays available via
``use_pallas=True`` for score matrices that genuinely exceed HBM-friendly
sizes — this script re-checks both facts on the current chip.

Run: python datasets/validate_vq_tpu.py  (one TPU process at a time)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from posterior_matching_tpu.runtime import configure_environment

configure_environment()

import jax
import jax.numpy as jnp
import numpy as np


def step_time(fn, *args, n=50):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n


def main():
    from posterior_matching_tpu.ops.vq import (
        nearest_codebook_indices_pallas,
        nearest_codebook_indices_xla,
    )

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(8192, 64), jnp.float32)
    cb = jnp.asarray(rng.randn(512, 64), jnp.float32)
    pal = jax.jit(nearest_codebook_indices_pallas)
    xla = jax.jit(nearest_codebook_indices_xla)
    same = bool(jnp.all(pal(z, cb) == xla(z, cb)))
    print(f"VQ pallas == xla on TPU: {same}", flush=True)
    t_pal = step_time(pal, z, cb)
    t_xla = step_time(xla, z, cb)
    print(f"VQ search: xla {t_xla*1e6:.1f} us, pallas {t_pal*1e6:.1f} us",
          flush=True)
    if not same:
        sys.exit(1)
    print("ALL PASS")


if __name__ == "__main__":
    main()
