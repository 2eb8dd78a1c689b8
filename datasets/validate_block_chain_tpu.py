"""On-TPU validation of the VDVAE block-chain kernels (ops/block_chain.py).

Same discipline as datasets/validate_chain_tpu.py (a mis-compiling Pallas
kernel can wedge the chip, so first contact is tiny), run ONE TPU process at
a time:

    python datasets/validate_block_chain_tpu.py

Steps:
0. SMOKE: the tiny 8x8 test-geometry Encoder, fused vs unfused forward.
1. f32 numerics at HIGHEST matmul precision, full pm_vdvae_mnist encoder
   geometry (width 192, blocks 28x6,28d2,14x4,14d2,7x2,7d2,3x2,3d2,1x2):
   fused vs unfused per-resolution activations and parameter grads of a
   sum-of-squares probe loss; tight relative tolerance.
2. bfloat16 compute: scale-relative comparison only (both paths round
   through the MXU, just differently).

Prints PASS/FAIL lines; exits nonzero on mismatch.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from posterior_matching_tpu.runtime import configure_environment

configure_environment()

import jax
import jax.numpy as jnp

from posterior_matching_tpu.models.vdvae import Encoder

FAILED = []


def check(name, ok, detail=""):
    print(("PASS " if ok else "FAIL ") + name + (f"  {detail}" if detail else ""),
          flush=True)
    if not ok:
        FAILED.append(name)


def rel_max(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = np.maximum(np.abs(b).max(), 1e-6)
    return float(np.abs(a - b).max() / scale)


def compare(enc_kw, x, cdtype, tol, tag):
    enc_ref = Encoder(fused_chain=False, compute_dtype=cdtype, **enc_kw)
    enc_fused = Encoder(fused_chain=True, compute_dtype=cdtype, **enc_kw)
    params = enc_ref.init(jax.random.PRNGKey(0), x)["params"]

    @jax.jit
    def fwd_ref(p, x):
        return enc_ref.apply({"params": p}, x)

    @jax.jit
    def fwd_fused(p, x):
        return enc_fused.apply({"params": p}, x)

    a_ref = jax.device_get(fwd_ref(params, x))
    a_fused = jax.device_get(fwd_fused(params, x))
    worst = max(rel_max(a_fused[r], a_ref[r]) for r in a_ref)
    check(f"{tag}: forward activations", worst < tol, f"rel-max {worst:.2e}")

    def probe(apply):
        def loss(p, x):
            acts = apply({"params": p}, x)
            return sum(jnp.sum(jnp.square(a.astype(jnp.float32)))
                       for a in acts.values())
        return jax.jit(jax.grad(loss))

    g_ref = jax.device_get(probe(enc_ref.apply)(params, x))
    g_fused = jax.device_get(probe(enc_fused.apply)(params, x))
    worst_g, worst_path = 0.0, None
    for (pa, a), (_, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g_fused), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(g_ref), key=str),
    ):
        r = rel_max(a, b)
        if r > worst_g:
            worst_g, worst_path = r, jax.tree_util.keystr(pa)
    check(f"{tag}: parameter grads", worst_g < tol,
          f"rel-max {worst_g:.2e} at {worst_path}")


def main():
    print(f"devices: {jax.devices()}", flush=True)

    # --- step 0: smoke at the CPU-test geometry ---
    rng = np.random.RandomState(0)
    x_small = jnp.asarray(rng.randn(2, 8, 8, 1), jnp.float32)
    small_kw = dict(width=16, blocks="8x3,8d2,4x2,4d4,1x2",
                    bottleneck_multiple=0.5)
    with jax.default_matmul_precision("highest"):
        compare(small_kw, x_small, None, 2e-5, "smoke 8x8 f32")

    # --- step 1: full mnist geometry, f32 highest precision ---
    mnist_kw = dict(
        width=192,
        blocks="28x6,28d2,14x4,14d2,7x2,7d2,3x2,3d2,1x2",
        bottleneck_multiple=0.25,
    )
    x = jnp.asarray(rng.randn(16, 28, 28, 1), jnp.float32)
    with jax.default_matmul_precision("highest"):
        compare(mnist_kw, x, None, 2e-4, "mnist f32(highest)")

    # --- step 2: bfloat16 compute, default precision ---
    compare(mnist_kw, x, "bfloat16", 6e-2, "mnist bf16")

    if FAILED:
        print(f"\n{len(FAILED)} FAILED: {FAILED}")
        sys.exit(1)
    print("\nALL PASS")


if __name__ == "__main__":
    main()
