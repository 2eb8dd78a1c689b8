"""Shared helpers for the Pallas PixelCNN kernels (ops/gated_chain.py).

Tap geometry (:class:`TapPlan` / :func:`plan_taps` — the statically-sliced
masked-conv layout, same values as the flax ``_MaskedConv`` params so the
checkpoint ABI is untouched) and the Mosaic-safe elementwise/matmul
primitives (f32 elu via exp: Mosaic lacks expm1 and bf16 vector compare).

The per-BLOCK fused kernel that originally lived here was retired in round
3: numerics exact, isolated microbench won 1.06x, but END-TO-END it lost
(55.3 vs 69.5 steps/s — pallas_call boundaries at block granularity block
XLA's cross-op fusion; BASELINE.md closure item 3). The gated-pair CHAIN /
multi-level SEGMENT kernels in ops/gated_chain.py subsume it.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class TapPlan(NamedTuple):
    """Static geometry of a sliced masked conv (see _MaskedConv)."""

    skh: int  # sliced kernel height (r1 - r0)
    skw: int  # sliced kernel width (c1 - c0)
    pad_top: int
    pad_left: int


def plan_taps(
    kernel_size: Tuple[int, int],
    valid_rows: Tuple[int, int],
    valid_cols: Tuple[int, int],
) -> TapPlan:
    """Derives the shifted-tap geometry of the sliced masked conv.

    SAME padding for the full stride-1 odd kernel is (k//2, k//2); slicing
    to taps [v0, v1) shifts it to (k//2 - v0, (v1-1) - k//2) (see
    models/pixelcnn.py::_MaskedConv). The fused kernel only supports
    non-negative pads — true for every gated-block constraint.
    """
    kh, kw = kernel_size
    (r0, r1), (c0, c1) = valid_rows, valid_cols
    pad_top = kh // 2 - r0
    pad_bottom = (r1 - 1) - kh // 2
    pad_left = kw // 2 - c0
    pad_right = (c1 - 1) - kw // 2
    if min(pad_top, pad_bottom, pad_left, pad_right) < 0:
        raise ValueError(
            f"fused gated block requires non-negative implied padding, got "
            f"{(pad_top, pad_bottom, pad_left, pad_right)} for kernel "
            f"{kernel_size} valid {valid_rows}x{valid_cols}"
        )
    return TapPlan(r1 - r0, c1 - c0, pad_top, pad_left)


def _elu(z):
    """elu via exp (jax.nn.elu lowers to expm1, which Mosaic lacks).
    The minimum() guard keeps exp() in-range; values match elu exactly.
    Math runs in f32: Mosaic has no bf16 vector compare (arith.cmpf on
    bf16 fails with "Target does not support this comparison"), and the
    f32 transcendentals match the unfused path's excess-precision
    elementwise ops. Callers cast the result to the compute dtype."""
    zf = z.astype(jnp.float32)
    return jnp.where(zf > 0, zf, jnp.exp(jnp.minimum(zf, 0.0)) - 1.0)


def _concat_elu(z):
    return jnp.concatenate([_elu(z), _elu(-z)], axis=-1)


def _concat_elu_bwd(z, g2):
    """d/dz of concat_elu given upstream [N, 2C] cotangent; z is [N, C].
    f32 internally for the same Mosaic bf16-compare reason as :func:`_elu`."""
    c = z.shape[-1]
    zf = z.astype(jnp.float32)
    g_pos = g2[..., :c].astype(jnp.float32)
    g_neg = g2[..., c:].astype(jnp.float32)
    d_pos = jnp.where(zf > 0, 1.0, jnp.exp(zf))
    d_neg = jnp.where(-zf > 0, 1.0, jnp.exp(-zf))
    return g_pos * d_pos - g_neg * d_neg


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """a^T @ b with contraction on axis 0 of both (no explicit transpose)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
