"""On-chip cost breakdown of the CelebA mixture mask (the step's prologue).

The flagship step spends <=1.68 ms generating masks (standalone-program
upper bound, datasets/profile_step_breakdown.py). The mixture flattens to
14 components — 1 random-pattern (SAT density selection + canvas crops),
1 image-Bernoulli, 1 rejection rectangle, 11 key-independent fixed
rectangles that XLA should constant-fold. This times each family alone at
flagship shapes to locate the milliseconds before optimizing any of them.

Run: python datasets/profile_mask_components.py  (one TPU process at a time)

MEASURED 2026-08-18 (v5e via the axon tunnel): celeb_a_mixture 6.89,
random_pattern 4.68, rectangle 2.21, image_bernoulli 4.32, fixed_rectangle
3.01, gcf_mixture 7.36 ms — a KEY-INDEPENDENT CONSTANT mask "costs" 3 ms,
i.e. per-dispatch relay latency dwarfs every component's compute and the
deltas are noise. Conclusion: the mask prologue (<=1.68 ms fused in-step,
bounded by the step breakdown) cannot be usefully micro-profiled through
this tunnel, and its remaining headroom (~1 ms) is below the measurement
noise floor. The step's real cost is the conv backward (12.6 ms) — see
BASELINE.md roadmap item 2 (megakernel).
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from posterior_matching_tpu.runtime import configure_environment

configure_environment()

from posterior_matching_tpu import masking

SHAPE = (32, 64, 64, 3)  # flagship batch


def _sync(v):
    return float(jnp.sum(v))


def timeit(name, fn, n=100):
    jfn = jax.jit(fn)
    out = jfn(jax.random.PRNGKey(0))
    _sync(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = jfn(jax.random.PRNGKey(i))
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:24s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    # NOTE: per-call key re-upload adds host->device latency uniformly to
    # every row; the DELTAS between rows are the signal.
    full = masking.get_mask_generator("CelebAMaskGenerator")
    timeit("celeb_a_mixture", lambda k: full(k, SHAPE))

    timeit(
        "random_pattern",
        lambda k: masking.random_pattern_mask(k, SHAPE, resolution=0.06),
    )
    timeit(
        "rectangle(best-of-K)",
        lambda k: masking.rectangle_mask(k, SHAPE),
    )
    timeit(
        "image_bernoulli",
        lambda k: masking.image_bernoulli_mask(k, SHAPE, p=0.2),
    )
    timeit(
        "fixed_rectangle",
        lambda k: masking.fixed_rectangle_mask(k, SHAPE, y1=16, x1=16,
                                               y2=48, x2=48),
    )

    gcf_g, gcf_w = masking.gcf_mask_spec()
    timeit(
        "gcf_mixture(6 fixed)",
        lambda k: masking.mixture_mask(k, SHAPE, gcf_g, gcf_w),
    )


if __name__ == "__main__":
    main()
