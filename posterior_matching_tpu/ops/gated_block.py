"""Pallas-fused gated PixelCNN residual block (forward + hand-written VJP).

The gated resnet block (reference pixel_cnn.py:465-522; our flax version
``PixelCNN._gated_residual``) is the PM-VQVAE train step's hot path: 12
blocks x 2 stacks x 2 masked convs at [32, 16, 16, 128]. Under XLA the
sliced-kernel convs run at ~40% MXU with fusion boundaries and layout
changes between every elementwise stage (measured, BASELINE.md). This
module computes the WHOLE block in one Pallas kernel per direction:

    u   = concat_elu(x)
    a1  = im2col(u) @ Wa + ba            (masked conv a, taps pre-sliced)
    a2  = a1 + concat_elu(aux) @ Waux    (horizontal stack only)
    v   = concat_elu(a2)
    d   = v * mask / keep                (dropout, mask generated outside)
    c   = im2col(d) @ Wb + bb + cond     (masked conv b)
    out = x + sigmoid(c[gate]) * c[act]

per grid step (one batch element), with every intermediate held in VMEM:
the conv becomes ONE [HW, T*C] x [T*C, Cout] MXU matmul per stage instead
of a padded XLA conv, and none of u/P/v/d ever round-trips to HBM.

The backward kernel replays the cheap elementwise stages from saved
residuals (a2, c) and computes all eight gradients in one pass; weight
gradients accumulate across the sequential TPU grid (one batch element at a
time) into replicated output blocks.

Weights arrive PRE-SLICED to the mask's valid region and flattened to
[T*C, Cout] (same values as the flax ``Conv_0`` params, so the checkpoint
ABI is untouched). Geometry is validated by :func:`plan_taps` — only
non-negative implied paddings are supported (true for every gated-block
spec the PixelCNN builds; the init/downsample convs stay on XLA).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _im2col(x_hw, h, w, c, taps: TapPlan):
    """[HW, C] -> [HW, T*C] patch matrix via zero-padded shifts.

    Pure value ops (reshape/pad/slice/concat) — lowers to VPU moves inside
    the kernel; the expensive part stays the single MXU matmul against the
    flattened weights.
    """
    grid = x_hw.reshape(h, w * c)
    padded = jnp.pad(
        grid,
        (
            (taps.pad_top, taps.skh - 1 - taps.pad_top),
            (taps.pad_left * c, (taps.skw - 1 - taps.pad_left) * c),
        ),
    )
    cols = []
    for i in range(taps.skh):
        for j in range(taps.skw):
            cols.append(
                padded[i : i + h, j * c : (j + w) * c].reshape(h * w, c)
            )
    return jnp.concatenate(cols, axis=1)


def _col2im(dp, h, w, c, taps: TapPlan):
    """Adjoint of :func:`_im2col`: [HW, T*C] -> [HW, C].

    Each tap's contribution is zero-padded to the full padded grid and the
    taps are SUMMED — pure pad+add ops (Mosaic has no scatter-add; overlap
    accumulation via .at[].add does not lower)."""
    total = None
    t = 0
    for i in range(taps.skh):
        for j in range(taps.skw):
            col = dp[:, t * c : (t + 1) * c].reshape(h, w * c)
            padded = jnp.pad(
                col,
                (
                    (i, taps.skh - 1 - i),
                    (j * c, (taps.skw - 1 - j) * c),
                ),
            )
            total = padded if total is None else total + padded
            t += 1
    return total[
        taps.pad_top : taps.pad_top + h,
        taps.pad_left * c : (taps.pad_left + w) * c,
    ].reshape(h * w, c)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """a^T @ b with contraction on axis 0 of both (no explicit transpose)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_kernel_factory(h, w, f, taps_a, taps_b, has_aux, keep, cdtype):
    def kernel(*refs):
        if has_aux:
            (x_ref, aux_ref, cond_ref, mask_ref,
             wa_ref, ba_ref, waux_ref, wb_ref, bb_ref,
             out_ref, a2_ref, c_ref) = refs
        else:
            (x_ref, cond_ref, mask_ref,
             wa_ref, ba_ref, wb_ref, bb_ref,
             out_ref, a2_ref, c_ref) = refs

        x = x_ref[0]                           # [HW, F]
        u = _concat_elu(x).astype(cdtype)      # [HW, 2F]
        pa = _im2col(u, h, w, 2 * f, taps_a)   # [HW, TA*2F]
        a1 = _dot(pa, wa_ref[:].astype(cdtype)) + ba_ref[0]  # [HW, F] f32
        if has_aux:
            ce_aux = _concat_elu(aux_ref[0]).astype(cdtype)
            a2 = a1 + _dot(ce_aux, waux_ref[:].astype(cdtype))
        else:
            a2 = a1
        v = _concat_elu(a2).astype(cdtype)     # [HW, 2F]
        d = (v * mask_ref[0].astype(cdtype) * (1.0 / keep)).astype(cdtype)
        pb = _im2col(d, h, w, 2 * f, taps_b)   # [HW, TB*2F]
        c = _dot(pb, wb_ref[:].astype(cdtype)) + bb_ref[0] + cond_ref[0, 0]
        act, gate = c[:, :f], c[:, f:]
        out_ref[0] = (x + jax.nn.sigmoid(gate) * act).astype(out_ref.dtype)
        a2_ref[0] = a2.astype(a2_ref.dtype)
        c_ref[0] = c.astype(c_ref.dtype)

    return kernel


def _bwd_kernel_factory(h, w, f, taps_a, taps_b, has_aux, keep, cdtype):
    def kernel(*refs):
        if has_aux:
            (x_ref, aux_ref, mask_ref, a2_ref, c_ref, g_ref,
             wa_ref, waux_ref, wb_ref,
             dx_ref, daux_ref, dcond_ref,
             dwa_ref, dba_ref, dwaux_ref, dwb_ref, dbb_ref) = refs
        else:
            (x_ref, mask_ref, a2_ref, c_ref, g_ref,
             wa_ref, wb_ref,
             dx_ref, dcond_ref,
             dwa_ref, dba_ref, dwb_ref, dbb_ref) = refs

        @pl.when(pl.program_id(0) == 0)
        def _init():
            dwa_ref[:] = jnp.zeros_like(dwa_ref)
            dba_ref[:] = jnp.zeros_like(dba_ref)
            dwb_ref[:] = jnp.zeros_like(dwb_ref)
            dbb_ref[:] = jnp.zeros_like(dbb_ref)
            if has_aux:
                dwaux_ref[:] = jnp.zeros_like(dwaux_ref)

        x = x_ref[0]
        a2 = a2_ref[0].astype(jnp.float32)
        c = c_ref[0].astype(jnp.float32)
        g = g_ref[0].astype(jnp.float32)       # [HW, F]

        act, gate = c[:, :f], c[:, f:]
        sg = jax.nn.sigmoid(gate)
        dact = g * sg
        dgate = g * act * sg * (1.0 - sg)
        dc = jnp.concatenate([dact, dgate], axis=1)  # [HW, 2F] f32

        dcond_ref[0, 0] = jnp.sum(dc, axis=0).astype(dcond_ref.dtype)
        dbb_ref[0] += jnp.sum(dc, axis=0)

        # replay forward pieces needed for weight grads
        v = _concat_elu(a2)
        d = (v * mask_ref[0].astype(jnp.float32) * (1.0 / keep)).astype(cdtype)
        pb = _im2col(d, h, w, 2 * f, taps_b)
        dc_c = dc.astype(cdtype)
        dwb_ref[:] += _dot_t(pb, dc_c)

        dpb = _dot(dc_c, wb_ref[:].astype(cdtype).T)          # [HW, TB*2F]
        dd = _col2im(dpb, h, w, 2 * f, taps_b)
        dv = dd * mask_ref[0].astype(jnp.float32) * (1.0 / keep)
        da2 = _concat_elu_bwd(a2, dv)          # [HW, F] f32 (= da1)

        da2_c = da2.astype(cdtype)
        if has_aux:
            aux = aux_ref[0]
            ce_aux = _concat_elu(aux).astype(cdtype)
            dwaux_ref[:] += _dot_t(ce_aux, da2_c)
            dce_aux = _dot(da2_c, waux_ref[:].astype(cdtype).T)
            daux_ref[0] = _concat_elu_bwd(aux, dce_aux).astype(daux_ref.dtype)

        dba_ref[0] += jnp.sum(da2, axis=0)
        u = _concat_elu(x).astype(cdtype)
        pa = _im2col(u, h, w, 2 * f, taps_a)
        dwa_ref[:] += _dot_t(pa, da2_c)

        dpa = _dot(da2_c, wa_ref[:].astype(cdtype).T)
        du = _col2im(dpa, h, w, 2 * f, taps_a)
        dx_ref[0] = (g + _concat_elu_bwd(x, du)).astype(dx_ref.dtype)

    return kernel


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _build(h, w, f, fa, taps_a, taps_b, has_aux, keep, dtype_name, interpret):
    """Builds the (fwd, bwd) pallas_calls + custom_vjp wrapper for one static
    geometry. Cached so repeated blocks share the jitted callables."""
    cdtype = jnp.dtype(dtype_name)
    hw = h * w
    ta = taps_a.skh * taps_a.skw
    tb = taps_b.skh * taps_b.skw
    f32 = jnp.float32

    def batch_spec(cols):
        return pl.BlockSpec((1, hw, cols), lambda b: (b, 0, 0))

    def row_spec(cols):
        return pl.BlockSpec((1, cols), lambda b: (0, 0))

    def full_spec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda b: (0, 0))

    fwd_kernel = _fwd_kernel_factory(
        h, w, f, taps_a, taps_b, has_aux, keep, cdtype
    )
    bwd_kernel = _bwd_kernel_factory(
        h, w, f, taps_a, taps_b, has_aux, keep, cdtype
    )

    def fwd_call(x, aux, cond, mask, wa, ba, waux, wb, bb):
        b = x.shape[0]
        in_specs = [batch_spec(f)]
        args = [x]
        if has_aux:
            in_specs.append(batch_spec(fa))
            args.append(aux)
        in_specs += [
            # cond rides as [B, 1, 2F]: TPU block shapes need the sublane
            # dim equal to the array dim (1) or divisible by 8
            pl.BlockSpec((1, 1, 2 * f), lambda i: (i, 0, 0)),
            batch_spec(2 * f),                            # dropout mask
            full_spec(ta * 2 * f, f),                     # wa
            row_spec(f),                                  # ba
        ]
        args += [cond, mask, wa, ba]
        if has_aux:
            in_specs.append(full_spec(2 * fa, f))
            args.append(waux)
        in_specs += [full_spec(tb * 2 * f, 2 * f), row_spec(2 * f)]
        args += [wb, bb]

        return pl.pallas_call(
            fwd_kernel,
            grid=(b,),
            in_specs=in_specs,
            out_specs=[batch_spec(f), batch_spec(f), batch_spec(2 * f)],
            out_shape=[
                jax.ShapeDtypeStruct((b, hw, f), x.dtype),      # out
                jax.ShapeDtypeStruct((b, hw, f), f32),          # a2
                jax.ShapeDtypeStruct((b, hw, 2 * f), f32),      # c
            ],
            interpret=interpret,
        )(*args)

    def bwd_call(x, aux, mask, a2, c, g, wa, waux, wb):
        b = x.shape[0]
        in_specs = [batch_spec(f)]
        args = [x]
        if has_aux:
            in_specs.append(batch_spec(fa))
            args.append(aux)
        in_specs += [
            batch_spec(2 * f),  # mask
            batch_spec(f),      # a2
            batch_spec(2 * f),  # c
            batch_spec(f),      # g
            full_spec(ta * 2 * f, f),
        ]
        args += [mask, a2, c, g, wa]
        if has_aux:
            in_specs.append(full_spec(2 * fa, f))
            args.append(waux)
        in_specs.append(full_spec(tb * 2 * f, 2 * f))
        args.append(wb)

        out_specs = [batch_spec(f)]
        out_shape = [jax.ShapeDtypeStruct((b, hw, f), f32)]      # dx
        if has_aux:
            out_specs.append(batch_spec(fa))
            out_shape.append(jax.ShapeDtypeStruct((b, hw, fa), f32))  # daux
        out_specs += [
            pl.BlockSpec((1, 1, 2 * f), lambda i: (i, 0, 0)),    # dcond
            full_spec(ta * 2 * f, f),                            # dwa
            row_spec(f),                                         # dba
        ]
        out_shape += [
            jax.ShapeDtypeStruct((b, 1, 2 * f), f32),
            jax.ShapeDtypeStruct((ta * 2 * f, f), f32),
            jax.ShapeDtypeStruct((1, f), f32),
        ]
        if has_aux:
            out_specs.append(full_spec(2 * fa, f))
            out_shape.append(jax.ShapeDtypeStruct((2 * fa, f), f32))  # dwaux
        out_specs += [full_spec(tb * 2 * f, 2 * f), row_spec(2 * f)]
        out_shape += [
            jax.ShapeDtypeStruct((tb * 2 * f, 2 * f), f32),      # dwb
            jax.ShapeDtypeStruct((1, 2 * f), f32),               # dbb
        ]

        return pl.pallas_call(
            bwd_kernel,
            grid=(b,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*args)

    @jax.custom_vjp
    def fused(x, aux, cond, mask, wa, ba, waux, wb, bb):
        out, _, _ = fwd_call(x, aux, cond, mask, wa, ba, waux, wb, bb)
        return out

    def fused_fwd(x, aux, cond, mask, wa, ba, waux, wb, bb):
        out, a2, c = fwd_call(x, aux, cond, mask, wa, ba, waux, wb, bb)
        return out, (x, aux, mask, a2, c, wa, waux, wb)

    def fused_bwd(res, g):
        x, aux, mask, a2, c, wa, waux, wb = res
        outs = bwd_call(x, aux, mask, a2, c, g, wa, waux, wb)
        if has_aux:
            dx, daux, dcond, dwa, dba, dwaux, dwb, dbb = outs
        else:
            dx, dcond, dwa, dba, dwb, dbb = outs
            daux, dwaux = None, None
        dx = dx.astype(x.dtype)
        return (
            dx,
            daux.astype(x.dtype) if has_aux else None,
            dcond.astype(x.dtype),
            jnp.zeros_like(mask),  # dropout mask: no grad path
            dwa.astype(wa.dtype),
            dba.astype(wa.dtype),      # (1, F): matches the reshaped primal
            dwaux.astype(wa.dtype) if has_aux else None,
            dwb.astype(wb.dtype),
            dbb.astype(wb.dtype),
        )

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_gated_block(
    x: jnp.ndarray,
    aux: Optional[jnp.ndarray],
    cond: Optional[jnp.ndarray],
    dropout_mask: jnp.ndarray,
    wa: jnp.ndarray,
    ba: jnp.ndarray,
    waux: Optional[jnp.ndarray],
    wb: jnp.ndarray,
    bb: jnp.ndarray,
    *,
    kernel_size: Tuple[int, int],
    valid_rows: Tuple[int, int],
    valid_cols: Tuple[int, int],
    keep_prob: float,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused gated residual block.

    Args:
        x: [B, H, W, F] stack input.
        aux: optional [B, H, W, FA] cross-stack cue (FA may differ from
            F — the down pass concatenates vertical + skip into 2F).
        cond: optional [B, 2F] conditional projection (already densely
            projected; pass None for an unconditional block).
        dropout_mask: [B, H, W, 2F] 0/1 keep mask (scaling by 1/keep_prob
            happens inside). Pass all-ones when not training.
        wa: [skh_a, skw_a, 2F, F] PRE-SLICED conv-a kernel; ba: [F].
        waux: optional [2*FA, F]; wb: [skh_b, skw_b, 2F, 2F]; bb: [2F].
        kernel_size/valid_rows/valid_cols: the conv-a == conv-b mask spec
            (both convs of a gated block share the constraint).
    """
    b, h, w, f = x.shape
    taps = plan_taps(kernel_size, valid_rows, valid_cols)
    has_aux = aux is not None
    fa = aux.shape[-1] if has_aux else 0
    fused = _build(
        h, w, f, fa, taps, taps, has_aux, float(keep_prob),
        jnp.dtype(compute_dtype).name, interpret,
    )

    flat = lambda t: t.reshape(b, h * w, t.shape[-1])
    wa_f = wa.reshape(-1, wa.shape[-1])
    wb_f = wb.reshape(-1, wb.shape[-1])
    if cond is None:
        cond = jnp.zeros((b, 2 * f), x.dtype)
    out = fused(
        flat(x),
        flat(aux) if has_aux else None,
        cond.astype(x.dtype).reshape(b, 1, 2 * f),
        flat(dropout_mask).astype(x.dtype),
        wa_f,
        ba.reshape(1, -1),
        waux,
        wb_f,
        bb.reshape(1, -1),
    )
    return out.reshape(b, h, w, f)
