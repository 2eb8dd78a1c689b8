"""On-TPU validation + microbenchmark of the fused gated-PAIR chain.

Run (ONE TPU process at a time; see .claude/skills/verify/SKILL.md):

    python datasets/validate_chain_tpu.py [--steps 0,1,2,3,4]

Steps:
0. SMOKE: one tiny gated_pair call (8x8 grid, F=8, batch 2) before any
   flagship-size kernel — a mis-compiling Pallas kernel can wedge the chip
   for hours, so the first on-device contact is as small as possible.
1. numerics at HIGHEST matmul precision, eval mode (keep=1): fused-chain vs
   unfused PixelCNN logits and eval-mode grads at identical params. The
   precision context applies at trace time so it reaches the jnp.dot calls
   inside the kernels; tight relative tolerance.
2. numerics at DEFAULT precision: scale-relative only (on TPU f32 matmuls
   run as bf16 MXU passes; both paths round, just differently).
3. training mode (in-kernel PRNG dropout): same step => bit-identical loss
   AND grads twice (the backward must regenerate the forward's masks);
   different dropout key => different loss; all grads finite; realized
   keep-rate inferred from the loss-vs-eval gap is not asserted (noisy) but
   the two-seed delta is printed.
4. microbench: full PixelCNN train grad step, fused-chain vs unfused,
   f32 AND bf16, value-fetch synced (block_until_ready is not a fence
   through the axon tunnel).

Prints PASS/FAIL lines plus timings; exits nonzero on numeric mismatch.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", default="0,1,2,3,4")
    args = parser.parse_args()
    steps = {int(s) for s in args.steps.split(",")}
    failures = []

    from posterior_matching_tpu.models.pixelcnn import PixelCNN

    # ---- step 0: tiny smoke ----------------------------------------------
    if 0 in steps:
        kw = dict(num_indices=12, image_shape=(8, 8), dropout=0.0,
                  num_resnet=1, num_hierarchies=1, num_filters=8)
        plain = PixelCNN(fused_chain=False, **kw)
        chain = PixelCNN(fused_chain=True, **kw)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randint(0, 12, (2, 8, 8)), jnp.int32)
        c = jnp.asarray(rng.randn(2, 16), jnp.float32)
        v = plain.init(jax.random.PRNGKey(0), x, c)
        t0 = time.time()
        lp = np.asarray(jax.jit(
            lambda v, x, c: plain.apply(v, x, c, training=False))(v, x, c))
        lc = np.asarray(jax.jit(
            lambda v, x, c: chain.apply(v, x, c, training=False))(v, x, c))
        rel = float(np.max(np.abs(lc - lp))) / max(float(np.max(np.abs(lp))), 1e-9)
        print(f"SMOKE: tiny chain fwd ok ({time.time()-t0:.1f}s), "
              f"rel-max {rel:.3e}", flush=True)
        if rel > 3e-2:
            failures.append(f"smoke fwd rel {rel:.3e}")
            print("SMOKE FAILED — aborting before flagship-size kernels")
            print("FAILURES:", failures)
            sys.exit(1)

    # ---- flagship-shape models -------------------------------------------
    kwargs = dict(
        num_indices=512, image_shape=(16, 16), dropout=0.5,
        num_resnet=12, num_hierarchies=1, num_filters=128,
    )
    models = {
        (mode, dt): PixelCNN(fused_chain=mode, dtype=dt, **kwargs)
        for mode in (False, True)
        for dt in (None, "bfloat16")
    }
    plain, chain = models[(False, None)], models[(True, None)]

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 512, (32, 16, 16)), jnp.int32)
    cond = jnp.asarray(rng.randn(32, 512), jnp.float32)

    variables = plain.init(jax.random.PRNGKey(0), x, cond)
    print("init ok", flush=True)

    def logits_fn(model):
        return jax.jit(lambda v, x, c: model.apply(v, x, c, training=False))

    def eval_loss_grad(model):
        def f(v, x, c):
            out = model.apply(v, x, c, training=False)
            return jnp.mean(out ** 2)
        return jax.jit(jax.grad(f))

    # ---- step 1: HIGHEST-precision equality -------------------------------
    if steps & {1, 2}:
        with jax.default_matmul_precision("highest"):
            t0 = time.time()
            l_plain_hi = np.asarray(logits_fn(plain)(variables, x, cond))
            l_chain_hi = np.asarray(logits_fn(chain)(variables, x, cond))
            print(f"highest-precision fwd ok ({time.time()-t0:.1f}s)",
                  flush=True)
            scale = float(np.max(np.abs(l_plain_hi)))
            rel = float(np.max(np.abs(l_chain_hi - l_plain_hi))) / scale
            print(f"fwd @highest: logits scale {scale:.1f}, "
                  f"chain-vs-plain rel-max {rel:.3e}", flush=True)
            if rel > 1e-4 and 1 in steps:
                failures.append(f"fwd@highest rel {rel:.3e}")

            if 1 in steps:
                t0 = time.time()
                g_plain = eval_loss_grad(plain)(variables, x, cond)
                g_chain = eval_loss_grad(chain)(variables, x, cond)
                worst = 0.0
                for (pa, a), (_, b) in zip(
                    sorted(jax.tree_util.tree_leaves_with_path(g_plain),
                           key=str),
                    sorted(jax.tree_util.tree_leaves_with_path(g_chain),
                           key=str),
                ):
                    a, b = np.asarray(a), np.asarray(b)
                    sc = max(float(np.max(np.abs(a))), 1e-12)
                    r = float(np.max(np.abs(a - b))) / sc
                    worst = max(worst, r)
                print(f"grads @highest ok ({time.time()-t0:.1f}s), "
                      f"worst per-leaf rel-max {worst:.3e}", flush=True)
                if worst > 5e-4:
                    failures.append(f"grads@highest rel {worst:.3e}")

    # ---- step 2: default precision (scale-relative) -----------------------
    if 2 in steps:
        l_plain = np.asarray(logits_fn(plain)(variables, x, cond))
        l_chain = np.asarray(logits_fn(chain)(variables, x, cond))
        r_plain = float(np.max(np.abs(l_plain - l_plain_hi))) / scale
        r_chain = float(np.max(np.abs(l_chain - l_plain_hi))) / scale
        print(f"fwd @default: plain-vs-hi {r_plain:.3e}, "
              f"chain-vs-hi {r_chain:.3e}", flush=True)
        if r_chain > max(3.0 * r_plain, 1e-3):
            failures.append(
                f"chain default-precision rounding {r_chain:.3e} "
                f"vs XLA's own {r_plain:.3e}")

    # ---- step 3: training mode, in-kernel PRNG dropout ---------------------
    if 3 in steps:
        def train_lg(model):
            def f(v, x, c, key):
                out = model.apply(v, x, c, training=True,
                                  rngs={"dropout": key})
                return jnp.mean(out ** 2)
            return jax.jit(jax.value_and_grad(f))

        lg = train_lg(chain)
        k0, k1 = jax.random.PRNGKey(7), jax.random.PRNGKey(8)
        l_a, g_a = lg(variables, x, cond, k0)
        l_b, g_b = lg(variables, x, cond, k0)
        l_c, _ = lg(variables, x, cond, k1)
        l_a, l_b, l_c = float(l_a), float(l_b), float(l_c)
        det = l_a == l_b
        print(f"train loss key0 {l_a:.6f} (repeat {l_b:.6f}), "
              f"key1 {l_c:.6f}", flush=True)
        if not det:
            failures.append("train loss not deterministic at fixed key")
        if l_a == l_c:
            failures.append("train loss identical across dropout keys")
        # bit-identical grads across repeats: the backward regenerated the
        # forward's masks
        for (pa, a), (_, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g_a), key=str),
            sorted(jax.tree_util.tree_leaves_with_path(g_b), key=str),
        ):
            a, b = np.asarray(a), np.asarray(b)
            if not np.array_equal(a, b):
                failures.append(f"train grad not deterministic: {pa}")
                break
            if not np.all(np.isfinite(a)):
                failures.append(f"non-finite train grad: {pa}")
                break
        else:
            print("train grads deterministic + finite", flush=True)

    # ---- step 4: grad-step microbench --------------------------------------
    if 4 in steps:
        def train_grad(model):
            def f(v, x, c, key):
                out = model.apply(v, x, c, training=True,
                                  rngs={"dropout": key})
                return jnp.mean(out ** 2)
            return jax.jit(jax.grad(f))

        key = jax.random.PRNGKey(0)
        for dt in (None, "bfloat16"):
            t_plain = step_time(
                train_grad(models[(False, dt)]), variables, x, cond, key)
            t_chain = step_time(
                train_grad(models[(True, dt)]), variables, x, cond, key)
            print(f"grad step [{dt or 'f32'}]: unfused {t_plain*1e3:.2f} ms, "
                  f"chain {t_chain*1e3:.2f} ms "
                  f"({t_plain/t_chain:.2f}x)", flush=True)

    if failures:
        print("FAILURES:")
        for f_ in failures:
            print(" -", f_)
        sys.exit(1)
    print("ALL PASS")


if __name__ == "__main__":
    main()
