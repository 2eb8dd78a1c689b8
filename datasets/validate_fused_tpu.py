"""On-TPU validation + microbenchmark of the fused Pallas gated block.

Run (one TPU process at a time; see .claude/skills/verify/SKILL.md):

    python datasets/validate_fused_tpu.py

Steps:
1. compile + run the fused kernel fwd/bwd at flagship shapes;
2. numerics: fused vs unfused PixelCNN logits and gradients at identical
   params (eval mode exact-path check + training-mode grad flow);
3. microbench: full PM-VQVAE train step, fused vs unfused, value-fetch
   synced (block_until_ready is not a fence through the axon tunnel);
4. microbench: Pallas VQ codebook search vs the XLA matmul path at
   flagship shapes (N=8192, K=512, D=64) — VERDICT round-1 item 6.

Prints PASS/FAIL lines plus timings; exits nonzero on numeric mismatch.
"""
import functools
import sys
import time

import numpy as np

from posterior_matching_tpu.runtime import configure_environment

configure_environment()

import jax
import jax.numpy as jnp


def _sync(v):
    return float(jnp.sum(jax.tree.leaves(v)[0]))


def step_time(fn, *args, n=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def main():
    failures = []

    # ---- 1+2: fused vs unfused PixelCNN ---------------------------------
    from posterior_matching_tpu.models.pixelcnn import PixelCNN

    kwargs = dict(
        num_indices=512, image_shape=(16, 16), dropout=0.5,
        num_resnet=12, num_hierarchies=1, num_filters=128,
    )
    plain = PixelCNN(fused=False, **kwargs)
    fused = PixelCNN(fused=True, **kwargs)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 512, (32, 16, 16)), jnp.int32)
    cond = jnp.asarray(rng.randn(32, 512), jnp.float32)

    variables = plain.init(jax.random.PRNGKey(0), x, cond)
    print("init ok", flush=True)

    l_plain = jax.jit(
        lambda v, x, c: plain.apply(v, x, c, training=False)
    )(variables, x, cond)
    t0 = time.time()
    l_fused = jax.jit(
        lambda v, x, c: fused.apply(v, x, c, training=False)
    )(variables, x, cond)
    err = float(jnp.max(jnp.abs(l_fused - l_plain)))
    print(f"fused fwd compile+run ok ({time.time()-t0:.1f}s); "
          f"max |logits diff| = {err:.3e}", flush=True)
    if err > 1e-3:
        failures.append(f"fwd logits mismatch {err}")

    def loss(model):
        def f(v, x, c, key):
            out = model.apply(
                v, x, c, training=True, rngs={"dropout": key}
            )
            return jnp.mean(out ** 2)
        return jax.jit(jax.grad(f))

    k = jax.random.PRNGKey(3)
    t0 = time.time()
    g_fused = loss(fused)(variables, x, cond, k)
    print(f"fused bwd compile+run ok ({time.time()-t0:.1f}s)", flush=True)
    g_plain = loss(plain)(variables, x, cond, k)
    # dropout masks differ between paths (different key derivation), so
    # compare only gradient MAGNITUDE sanity + finiteness here; the exact
    # gradient match is covered on CPU interpret (tests/test_gated_block.py)
    for name, g in (("fused", g_fused), ("plain", g_plain)):
        finite = all(
            bool(jnp.isfinite(leaf).all()) for leaf in jax.tree.leaves(g)
        )
        print(f"{name} grads finite: {finite}", flush=True)
        if not finite:
            failures.append(f"{name} grads non-finite")

    # ---- 3: step-time microbench ---------------------------------------
    t_plain = step_time(loss(plain), variables, x, cond, k)
    t_fused = step_time(loss(fused), variables, x, cond, k)
    print(f"grad step: unfused {t_plain*1e3:.2f} ms, "
          f"fused {t_fused*1e3:.2f} ms "
          f"({t_plain/t_fused:.2f}x)", flush=True)

    # ---- 4: VQ kernel microbench ---------------------------------------
    from posterior_matching_tpu.ops.vq import (
        nearest_codebook_indices_pallas,
        nearest_codebook_indices_xla,
    )

    z = jnp.asarray(rng.randn(8192, 64), jnp.float32)
    cb = jnp.asarray(rng.randn(512, 64), jnp.float32)
    pal = jax.jit(nearest_codebook_indices_pallas)
    xla = jax.jit(nearest_codebook_indices_xla)
    same = bool(jnp.all(pal(z, cb) == xla(z, cb)))
    print(f"VQ pallas == xla on TPU: {same}", flush=True)
    if not same:
        failures.append("VQ pallas != xla on TPU")
    t_pal = step_time(pal, z, cb, n=50)
    t_xla = step_time(xla, z, cb, n=50)
    print(f"VQ search: xla {t_xla*1e6:.1f} us, pallas {t_pal*1e6:.1f} us",
          flush=True)

    if failures:
        print("FAIL:", failures)
        sys.exit(1)
    print("ALL PASS")


if __name__ == "__main__":
    main()
