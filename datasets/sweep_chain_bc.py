"""Sweep the fused-chain kernels' batch-chunk sizes on TPU.

The chain kernels are now the step: the round-3 device trace
(/tmp/pm_trace_chain) shows 48 Pallas kernels/step totalling 8.64 ms of the
12.87 ms device-busy step — fwd pairs at ~117/125 us (58% MXU), bwd at
~232/246 us — while the step's 1206 GFLOP mean a 6.1 ms floor at bf16 peak.
Chunk size sets the rows-per-matmul and the grid pipelining depth
(PM_TPU_CHAIN_BC_FWD / _BC_BWD are read at trace time), so this sweeps them
and also times a dropout=0 model to isolate the in-kernel PRNG cost.

Run: python datasets/sweep_chain_bc.py  (one TPU process at a time)
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

from posterior_matching_tpu.models.pixelcnn import PixelCNN


def _sync(v):
    return float(jnp.sum(jax.tree.leaves(v)[0]))


def step_time(fn, *args, n=30):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def main():
    os.environ["PM_TPU_CHAIN_VMEM_MB"] = "110"

    kwargs = dict(
        num_indices=512, image_shape=(16, 16),
        num_resnet=12, num_hierarchies=1, num_filters=128,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 512, (32, 16, 16)), jnp.int32)
    cond = jnp.asarray(rng.randn(32, 512), jnp.float32)
    key = jax.random.PRNGKey(0)

    model0 = PixelCNN(fused_chain=True, dtype="bfloat16", dropout=0.5,
                      **kwargs)
    variables = model0.init(jax.random.PRNGKey(0), x, cond)

    def train_grad(model):
        def f(v, x, c, key):
            out = model.apply(v, x, c, training=True,
                              rngs={"dropout": key})
            return jnp.mean(out ** 2)
        return jax.jit(jax.grad(f))

    def fwd(model):
        def f(v, x, c, key):
            out = model.apply(v, x, c, training=True,
                              rngs={"dropout": key})
            return jnp.mean(out ** 2)
        return jax.jit(f)

    results = []
    # (bc_fwd, bc_bwd, dropout) — baseline first so a later-config compile
    # failure still leaves the reference measurement banked.
    grid = [
        (4, 2, 0.5),    # current default (= round-3 validated numbers)
        (8, 4, 0.5),
        (16, 8, 0.5),
        (8, 8, 0.5),
        (16, 16, 0.5),
        (4, 2, 0.0),    # PRNG/dropout cost isolation at the default chunks
    ]
    for bc_f, bc_b, drop in grid:
        os.environ["PM_TPU_CHAIN_BC_FWD"] = str(bc_f)
        os.environ["PM_TPU_CHAIN_BC_BWD"] = str(bc_b)
        model = PixelCNN(fused_chain=True, dtype="bfloat16", dropout=drop,
                         **kwargs)
        tag = f"bc_fwd={bc_f} bc_bwd={bc_b} dropout={drop}"
        try:
            t0 = time.time()
            tf = step_time(fwd(model), variables, x, cond, key)
            tg = step_time(train_grad(model), variables, x, cond, key)
            print(f"{tag}: fwd {tf*1e3:.2f} ms, grad {tg*1e3:.2f} ms "
                  f"(compile+run {time.time()-t0:.0f}s)", flush=True)
            results.append((tag, tf, tg))
        except Exception as e:  # noqa: BLE001 — sweep must survive one bad config
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)

    if results:
        best = min(results, key=lambda r: r[2])
        print(f"BEST: {best[0]} grad {best[2]*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
