"""Pallas gated-PAIR kernels for the PixelCNN training path.

The PM-VQVAE train step's measured profile (datasets/profile_cost_analysis.py,
2026-08-19, TPU v5e): the compiled grad is **1206 GFLOP** and runs in 13.25 ms
= 46% of bf16 MXU peak, fragmented by XLA into ~766 fusion kernels with ~2150
inter-fusion HBM copies (BASELINE.md).  The north star (>= 5x the reference
implementation, reference train_pm_vqvae.py:81-99) needs the grad at ~9 ms =
~67% MXU.  Launch overhead and HBM round trips between the ~150 conv ops are
the recoverable slack — kernel consolidation, not algebraic rewrites.

This module fuses one PixelCNN resnet LEVEL — the vertical gated block plus
the horizontal gated block that consumes it (reference pixel_cnn.py:451-522;
our ``PixelCNN._gated_residual``) — into ONE Pallas kernel for the forward
and ONE for the backward, with

- the batch processed in row chunks (grid over chunks) so every intermediate
  of both blocks lives in VMEM, with per-tap MXU matmuls (a sliced masked
  conv is 4-6 shifted [rows, 2F] x [2F, Fout] matmuls — the same math as
  models/pixelcnn.py::_MaskedConv, checkpoint ABI untouched);
- dropout masks generated IN-KERNEL from the TPU PRNG (pltpu.prng_*), seeded
  per (step, block, image) so the backward regenerates bit-identical masks
  instead of streaming [B, HW, 2F] masks through HBM (threefry/rbg dropout
  was ~25% of the step, BASELINE.md).  The PRNG primitives have no
  interpret-mode lowering in this JAX version, so CPU tests inject masks via
  ``mask_mode='input'`` (same kernel body, masks as inputs);
- a hand-written VJP: saves are the block inputs and the two conv outputs
  (a1, b1) in compute dtype; everything else (concat_elu, dropout, gating)
  is recomputed on the VPU in the backward kernel; weight gradients
  accumulate across the sequential chunk grid in f32 output blocks.

Two variants cover the whole 24-level chain of a ``num_hierarchies == 1``
network:

- ``up`` pairs: vertical (no aux) + horizontal (aux = new vertical);
- ``down`` pairs: vertical (aux = skip) + horizontal (aux = new vertical +
  skip), with the 4F-input aux Dense split at pack time into two [2F, F]
  halves (concat_elu(concat(u, s)) @ W == concat_elu(u) @ W_u +
  concat_elu(s) @ W_s for the right row permutation of W), so every aux
  contribution is the uniform ``concat_elu(x) @ [2F, F]`` shape.

The chain composition (24 pair calls + skip wiring) lives in
``models/pixelcnn.py``; JAX autodiff routes the dskip cotangents returned
here back through the up-pass saves, so no manual gradient plumbing exists
outside the kernels.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from posterior_matching_tpu.ops.gated_block import (
    TapPlan,
    _concat_elu,
    _concat_elu_bwd,
    _dot,
    _dot_t,
    plan_taps,
)

f32 = jnp.float32


class PairConfig(NamedTuple):
    """Static geometry/config of one gated pair (hashable: lru_cache key)."""

    h: int
    w: int
    f: int
    cond_dim: int
    taps_v: TapPlan
    taps_h: TapPlan
    keep: float          # dropout keep prob; 1.0 = no dropout (eval)
    cdtype: str          # compute dtype name ("float32" / "bfloat16")
    bc_fwd: int          # images per forward chunk
    bc_bwd: int          # images per backward chunk
    mask_mode: str       # "prng" (TPU) | "input" (tests / CPU interpret)
    interpret: bool


def _taps(tp: TapPlan):
    return [(i, j) for i in range(tp.skh) for j in range(tp.skw)]


def _pad_hw(x4, pt, pb, pl_, pr_):
    """Zero-pad dims 1 (H) and 2 (W) of [bc, h, w, c] via concatenate —
    per-image padding without lax.pad (keeps the Mosaic lowering simple)."""
    bc, h, w, c = x4.shape
    dt = x4.dtype
    if pl_ or pr_:
        parts = []
        if pl_:
            parts.append(jnp.zeros((bc, h, pl_, c), dt))
        parts.append(x4)
        if pr_:
            parts.append(jnp.zeros((bc, h, pr_, c), dt))
        x4 = jnp.concatenate(parts, axis=2)
        w = w + pl_ + pr_
    if pt or pb:
        parts = []
        if pt:
            parts.append(jnp.zeros((bc, pt, w, c), dt))
        parts.append(x4)
        if pb:
            parts.append(jnp.zeros((bc, pb, w, c), dt))
        x4 = jnp.concatenate(parts, axis=1)
    return x4


def _conv_fwd(x2, w_ref, tp: TapPlan, bc, h, w, cin, cout, cdtype):
    """Sliced masked conv as per-tap matmuls: [rows, cin] -> [rows, cout] f32.

    ``w_ref`` is the flattened [T*cin, cout] kernel (tap-major, the same
    row-major order as ``wa.reshape(-1, cout)`` of the sliced [skh, skw,
    cin, cout] kernel)."""
    rows = bc * h * w
    x4 = x2.reshape(bc, h, w, cin)
    padded = _pad_hw(
        x4, tp.pad_top, tp.skh - 1 - tp.pad_top,
        tp.pad_left, tp.skw - 1 - tp.pad_left,
    )
    acc = None
    for t, (i, j) in enumerate(_taps(tp)):
        sh = padded[:, i : i + h, j : j + w, :].reshape(rows, cin)
        wt = w_ref[t * cin : (t + 1) * cin, :].astype(cdtype)
        d = _dot(sh, wt)
        acc = d if acc is None else acc + d
    return acc


def _conv_bwd_input(db, w_ref, tp: TapPlan, bc, h, w, cin, cout, cdtype):
    """Adjoint of :func:`_conv_fwd` w.r.t. the input: [rows, cout] ->
    [rows, cin] f32.  Overlap accumulation via padded adds (no scatter)."""
    rows = bc * h * w
    total = None
    for t, (i, j) in enumerate(_taps(tp)):
        wt = w_ref[t * cin : (t + 1) * cin, :].astype(cdtype)
        contrib = _dot(db, wt.T).reshape(bc, h, w, cin)
        padded = _pad_hw(contrib, i, tp.skh - 1 - i, j, tp.skw - 1 - j)
        total = padded if total is None else total + padded
    return total[
        :, tp.pad_top : tp.pad_top + h, tp.pad_left : tp.pad_left + w, :
    ].reshape(rows, cin)


def _conv_bwd_weights(x2, db, dw_ref, tp: TapPlan, bc, h, w, cin, cdtype):
    """Accumulates dW (+=) into the [T*cin, cout] f32 ref: per tap,
    shift(x)^T @ db."""
    rows = bc * h * w
    x4 = x2.reshape(bc, h, w, cin)
    padded = _pad_hw(
        x4, tp.pad_top, tp.skh - 1 - tp.pad_top,
        tp.pad_left, tp.skw - 1 - tp.pad_left,
    )
    for t, (i, j) in enumerate(_taps(tp)):
        sh = padded[:, i : i + h, j : j + w, :].reshape(rows, cin)
        dw_ref[t * cin : (t + 1) * cin, :] += _dot_t(sh, db)


def _block_fwd(
    cfg: PairConfig, tp: TapPlan, bc, x, aux_list, proj, mask,
    wa_ref, ba_ref, wb_ref, bb_ref,
):
    """One gated block forward on values. Returns (x_new, a1_save, b1_save).

    aux_list: [(aux_value [rows, F] cdtype, wx_ref [2F, F])] — each
    contributes concat_elu(aux) @ wx to a1.
    proj: [bc, 2F] f32 conditional projection (broadcast over positions).
    mask: [rows, 2F] f32 0/1 dropout keep mask (or None when keep == 1).
    """
    h, w, f = cfg.h, cfg.w, cfg.f
    rows = bc * h * w
    cdtype = jnp.dtype(cfg.cdtype)

    ce1 = _concat_elu(x).astype(cdtype)                     # [rows, 2F]
    a1 = _conv_fwd(ce1, wa_ref, tp, bc, h, w, 2 * f, f, cdtype)
    for aux, wx_ref in aux_list:
        a1 = a1 + _dot(_concat_elu(aux).astype(cdtype), wx_ref[:].astype(cdtype))
    a1 = a1 + ba_ref[:].astype(f32)          # [1, F] broadcasts over rows
    a1s = a1.astype(cdtype)

    ce2 = _concat_elu(a1s)                                  # f32 [rows, 2F]
    if mask is not None:
        ce2 = ce2 * mask * (1.0 / cfg.keep)
    d = ce2.astype(cdtype)

    b1 = _conv_fwd(d, wb_ref, tp, bc, h, w, 2 * f, 2 * f, cdtype)
    b1 = b1 + bb_ref[:].astype(f32)
    b1 = b1 + jnp.broadcast_to(
        proj[:, None, :], (bc, h * w, 2 * f)
    ).reshape(rows, 2 * f)
    b1s = b1.astype(cdtype)

    act = b1s[:, :f].astype(f32)
    gate = b1s[:, f:].astype(f32)
    x_new = (x.astype(f32) + jax.nn.sigmoid(gate) * act).astype(cdtype)
    return x_new, a1s, b1s


def _block_bwd(
    cfg: PairConfig, tp: TapPlan, bc, g, x, aux_list, mask,
    a1s, b1s, wa_ref, wb_ref, dwa_ref, dba_ref, dwb_ref, dbb_ref,
):
    """One gated block backward on values.

    g: [rows, F] f32 cotangent of the block OUTPUT (all contributions
    already summed).  aux_list: [(aux_value, wx_ref, dwx_ref)].
    Returns (dx f32 [rows, F], [daux f32 [rows, F] per aux],
    db1 f32 [rows, 2F] — for the caller's cond grads).
    """
    h, w, f = cfg.h, cfg.w, cfg.f
    cdtype = jnp.dtype(cfg.cdtype)

    b1 = b1s.astype(f32)
    act, gate = b1[:, :f], b1[:, f:]
    sg = jax.nn.sigmoid(gate)
    dact = g * sg
    dgate = g * act * sg * (1.0 - sg)
    db1 = jnp.concatenate([dact, dgate], axis=1)            # f32 [rows, 2F]
    db1c = db1.astype(cdtype)
    dbb_ref[:] += jnp.sum(db1, axis=0, keepdims=True)

    # conv_b: recompute d from a1 + mask
    ce2 = _concat_elu(a1s)
    if mask is not None:
        ce2 = ce2 * mask * (1.0 / cfg.keep)
    d = ce2.astype(cdtype)
    _conv_bwd_weights(d, db1c, dwb_ref, tp, bc, h, w, 2 * f, cdtype)
    dd = _conv_bwd_input(db1c, wb_ref, tp, bc, h, w, 2 * f, 2 * f, cdtype)
    if mask is not None:
        dd = dd * mask * (1.0 / cfg.keep)
    da1 = _concat_elu_bwd(a1s, dd)                          # f32 [rows, F]
    da1c = da1.astype(cdtype)
    dba_ref[:] += jnp.sum(da1, axis=0, keepdims=True)

    dauxes = []
    for aux, wx_ref, dwx_ref in aux_list:
        ce_aux = _concat_elu(aux).astype(cdtype)
        dwx_ref[:] += _dot_t(ce_aux, da1c)
        dce_aux = _dot(da1c, wx_ref[:].astype(cdtype).T)
        dauxes.append(_concat_elu_bwd(aux, dce_aux))        # f32 [rows, F]

    ce1 = _concat_elu(x).astype(cdtype)
    _conv_bwd_weights(ce1, da1c, dwa_ref, tp, bc, h, w, 2 * f, cdtype)
    dce1 = _conv_bwd_input(da1c, wa_ref, tp, bc, h, w, 2 * f, f, cdtype)
    dx = g + _concat_elu_bwd(x, dce1)
    return dx, dauxes, db1


def _proj(cond, wc_ref, cdtype):
    """[bc, cond_dim] x [cond_dim, 2F] -> [bc, 2F] f32 (bias folded into bb
    at pack time)."""
    return _dot(cond.astype(cdtype), wc_ref[:].astype(cdtype))


def _masks_for_chunk(cfg: PairConfig, bc, meta_ref, sub_block, pair_offset=0,
                     chunk_pid=None):
    """In-kernel per-image dropout masks for the current chunk.

    Seeded (step_seed, block_id, global_image) PER IMAGE so the realized
    bits are independent of the chunk size — forward (bc_fwd) and backward
    (bc_bwd) regenerate identical masks.  block_id = 2*pair_index +
    sub_block disambiguates the vertical/horizontal draws; ``pair_offset``
    adds the level index inside a multi-level SEGMENT kernel (segments seed
    identically to the equivalent pair-kernel sequence, so the two paths
    realize bit-identical dropout).  ``chunk_pid`` overrides which grid
    axis carries the batch chunk (the STREAMED kernels grid over
    (level, chunk), so the chunk is program_id(1) there); ``pair_offset``
    may be a traced value (the streamed level index).

    The Mosaic on current libtpu accepts at most TWO prng_seed words, so
    block_id and the global image index are packed into one: images get the
    low 20 bits (flagship batch is 32; 2^20 leaves 11 bits of block_id
    headroom before any collision is possible)."""
    hw = cfg.h * cfg.w
    thresh = np.uint32(min(int(cfg.keep * (2.0 ** 32)), 2 ** 32 - 1))
    if chunk_pid is None:
        chunk_pid = pl.program_id(0)
    parts = []
    for im in range(bc):
        block_id = (meta_ref[1] + pair_offset) * 2 + sub_block
        image_id = chunk_pid * bc + im
        pltpu.prng_seed(meta_ref[0], block_id * (2 ** 20) + image_id)
        # On-chip the raw bits surface as int32 — bitcast to uint32 before
        # the threshold compare or keep=0.5 (thresh exactly 2^31) degenerates
        # into a sign test (interpret mode returns uint32 and hides this).
        parts.append(
            pltpu.bitcast(pltpu.prng_random_bits((hw, 2 * cfg.f)),
                          jnp.uint32))
    bits = parts[0] if bc == 1 else jnp.concatenate(parts, axis=0)
    return (bits < thresh).astype(f32)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_kernel_factory(cfg: PairConfig, down: bool):
    bc = cfg.bc_fwd
    cdtype = jnp.dtype(cfg.cdtype)
    use_mask = cfg.keep < 1.0

    def kernel(*refs):
        it = iter(refs)
        meta_ref = next(it)
        xv_ref, xh_ref = next(it), next(it)
        if down:
            skv_ref, skh_ref = next(it), next(it)
        cond_ref = next(it)
        wav, bav, wbv, bbv, wcv = (next(it) for _ in range(5))
        if down:
            wxv = next(it)
        wah, bah, wbh, bbh, wch = (next(it) for _ in range(5))
        wxh_u = next(it)
        if down:
            wxh_s = next(it)
        if use_mask and cfg.mask_mode == "input":
            mv_ref, mh_ref = next(it), next(it)
        xvo, xho, a1v_ref, a1h_ref, b1v_ref, b1h_ref = (
            next(it) for _ in range(6)
        )

        if use_mask:
            if cfg.mask_mode == "input":
                mv = mv_ref[:].astype(f32)
                mh = mh_ref[:].astype(f32)
            else:
                mv = _masks_for_chunk(cfg, bc, meta_ref, 0)
                mh = _masks_for_chunk(cfg, bc, meta_ref, 1)
        else:
            mv = mh = None

        # cond rides as [bc, 1, cd] — Mosaic constrains only the LAST TWO
        # block dims (sublane x lane), so the grid-chunked batch axis must
        # lead and the (1, cd) tail must equal the array's.
        cond2d = cond_ref[:].reshape(bc, cfg.cond_dim)
        xv = xv_ref[:]
        aux_v = [(skv_ref[:], wxv)] if down else []
        xv_new, a1v, b1v = _block_fwd(
            cfg, cfg.taps_v, bc, xv, aux_v, _proj(cond2d, wcv, cdtype),
            mv, wav, bav, wbv, bbv,
        )
        xvo[:] = xv_new
        a1v_ref[:] = a1v
        b1v_ref[:] = b1v

        aux_h = [(xv_new, wxh_u)]
        if down:
            aux_h.append((skh_ref[:], wxh_s))
        xh_new, a1h, b1h = _block_fwd(
            cfg, cfg.taps_h, bc, xh_ref[:], aux_h,
            _proj(cond2d, wch, cdtype), mh, wah, bah, wbh, bbh,
        )
        xho[:] = xh_new
        a1h_ref[:] = a1h
        b1h_ref[:] = b1h

    return kernel


def _bwd_kernel_factory(cfg: PairConfig, down: bool):
    bc = cfg.bc_bwd
    cdtype = jnp.dtype(cfg.cdtype)
    use_mask = cfg.keep < 1.0
    hw = cfg.h * cfg.w
    f = cfg.f

    def kernel(*refs):
        it = iter(refs)
        meta_ref = next(it)
        gv_ref, gh_ref = next(it), next(it)
        xv_ref, xh_ref = next(it), next(it)
        if down:
            skv_ref, skh_ref = next(it), next(it)
        xvn_ref = next(it)                     # x_v AFTER the v block
        cond_ref = next(it)
        a1v_ref, a1h_ref, b1v_ref, b1h_ref = (next(it) for _ in range(4))
        wav, wbv, wcv = (next(it) for _ in range(3))
        if down:
            wxv = next(it)
        wah, wbh, wch = (next(it) for _ in range(3))
        wxh_u = next(it)
        if down:
            wxh_s = next(it)
        if use_mask and cfg.mask_mode == "input":
            mv_ref, mh_ref = next(it), next(it)

        dgv_ref, dgh_ref = next(it), next(it)
        if down:
            dskv_ref, dskh_ref = next(it), next(it)
        dcond_ref = next(it)
        dwav, dbav, dwbv, dbbv, dwcv = (next(it) for _ in range(5))
        if down:
            dwxv = next(it)
        dwah, dbah, dwbh, dbbh, dwch = (next(it) for _ in range(5))
        dwxh_u = next(it)
        if down:
            dwxh_s = next(it)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in (dwav, dbav, dwbv, dbbv, dwcv, dwah, dbah, dwbh,
                      dbbh, dwch, dwxh_u):
                r[:] = jnp.zeros_like(r)
            if down:
                dwxv[:] = jnp.zeros_like(dwxv)
                dwxh_s[:] = jnp.zeros_like(dwxh_s)

        if use_mask:
            if cfg.mask_mode == "input":
                mv = mv_ref[:].astype(f32)
                mh = mh_ref[:].astype(f32)
            else:
                mv = _masks_for_chunk(cfg, bc, meta_ref, 0)
                mh = _masks_for_chunk(cfg, bc, meta_ref, 1)
        else:
            mv = mh = None

        cond = cond_ref[:].reshape(bc, cfg.cond_dim).astype(cdtype)
        xv_new = xvn_ref[:]

        # ---- horizontal block backward -----------------------------------
        aux_h = [(xv_new, wxh_u, dwxh_u)]
        if down:
            aux_h.append((skh_ref[:], wxh_s, dwxh_s))
        dxh, dauxes_h, db1h = _block_bwd(
            cfg, cfg.taps_h, bc, gh_ref[:].astype(f32), xh_ref[:], aux_h,
            mh, a1h_ref[:], b1h_ref[:], wah, wbh, dwah, dbah, dwbh, dbbh,
        )
        rs_h = db1h.reshape(bc, hw, 2 * f).sum(axis=1)      # [bc, 2F] f32
        dwch[:] += _dot_t(cond, rs_h.astype(cdtype))
        dgh_ref[:] = dxh.astype(dgh_ref.dtype)
        if down:
            dskh_ref[:] = dauxes_h[1].astype(dskh_ref.dtype)

        # ---- vertical block backward -------------------------------------
        gv_total = gv_ref[:].astype(f32) + dauxes_h[0]
        aux_v = [(skv_ref[:], wxv, dwxv)] if down else []
        dxv, dauxes_v, db1v = _block_bwd(
            cfg, cfg.taps_v, bc, gv_total, xv_ref[:], aux_v,
            mv, a1v_ref[:], b1v_ref[:], wav, wbv, dwav, dbav, dwbv, dbbv,
        )
        rs_v = db1v.reshape(bc, hw, 2 * f).sum(axis=1)
        dwcv[:] += _dot_t(cond, rs_v.astype(cdtype))
        dgv_ref[:] = dxv.astype(dgv_ref.dtype)
        if down:
            dskv_ref[:] = dauxes_v[0].astype(dskv_ref.dtype)

        dcond = _dot(rs_v.astype(cdtype), wcv[:].astype(cdtype).T) + _dot(
            rs_h.astype(cdtype), wch[:].astype(cdtype).T
        )
        dcond_ref[:] = dcond.reshape(bc, 1, cfg.cond_dim).astype(
            dcond_ref.dtype
        )

    return kernel


# ---------------------------------------------------------------------------
# pallas_call builders + custom_vjp
# ---------------------------------------------------------------------------


def _compiler_params(levels: int = 1):
    """Raise the kernel's scoped-VMEM cap above XLA's 16 MiB default.

    At flagship shapes (batch chunk 4, F=128, 16x16 grid) the forward pair's
    working set — double-buffered activation/output blocks plus the resident
    packed weights — measures 19.6 MiB, over the default scoped limit though
    comfortably inside v5e's physical VMEM (128 MiB).  SEGMENT kernels hold
    ``levels`` pairs' weights + per-level saves resident (the L=4 down
    forward measures 65.2 MiB), so the cap scales with the level count,
    clamped under the physical VMEM.  Env-tunable for odd parts.
    """
    default = min(120, 64 + 14 * (levels - 1))
    limit = int(
        os.environ.get("PM_TPU_CHAIN_VMEM_MB", str(default))
    ) * 2**20
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def _weight_shapes(cfg: PairConfig, down: bool):
    """(name, (rows, cols)) for the packed pair weights, in argument order."""
    f, cd = cfg.f, cfg.cond_dim
    tv = cfg.taps_v.skh * cfg.taps_v.skw
    th = cfg.taps_h.skh * cfg.taps_h.skw
    shapes = [
        ("wav", (tv * 2 * f, f)), ("bav", (1, f)),
        ("wbv", (tv * 2 * f, 2 * f)), ("bbv", (1, 2 * f)),
        ("wcv", (cd, 2 * f)),
    ]
    if down:
        shapes.append(("wxv", (2 * f, f)))
    shapes += [
        ("wah", (th * 2 * f, f)), ("bah", (1, f)),
        ("wbh", (th * 2 * f, 2 * f)), ("bbh", (1, 2 * f)),
        ("wch", (cd, 2 * f)),
        ("wxh_u", (2 * f, f)),
    ]
    if down:
        shapes.append(("wxh_s", (2 * f, f)))
    return shapes


@functools.lru_cache(maxsize=32)
def _build_pair(cfg: PairConfig, down: bool, batch: int):
    """Builds the custom_vjp'd pair function for one static configuration.

    Returned callable signature (all arrays):
        fn(meta, xv, xh, [skv, skh,] cond, *weights [, mv, mh])
        -> (xv_new, xh_new)
    meta: [2] int32 = (step_seed, pair_index).  Activations are
    [batch, H*W, F] in compute dtype; weights as in :func:`_weight_shapes`;
    masks (input mode, keep < 1) are [batch, H*W, 2F].
    """
    h, w, f, cd = cfg.h, cfg.w, cfg.f, cfg.cond_dim
    hw = h * w
    cdtype = jnp.dtype(cfg.cdtype)
    use_mask_inputs = cfg.keep < 1.0 and cfg.mask_mode == "input"
    wshapes = _weight_shapes(cfg, down)
    n_act_in = 4 if down else 2          # xv, xh [, skv, skh]

    if batch % cfg.bc_fwd or batch % cfg.bc_bwd:
        raise ValueError(
            f"batch {batch} not divisible by chunk sizes "
            f"({cfg.bc_fwd}, {cfg.bc_bwd})"
        )

    def act_spec(bc, cols):
        return pl.BlockSpec((bc * hw, cols), lambda i: (i, 0))

    def cond_spec(bc):
        # [batch, 1, cd] with the batch axis leading: Mosaic's tiling rule
        # constrains only the last two block dims, and (1, cd) equals the
        # array's tail, so any bc (even < 8) is legal.
        return pl.BlockSpec((bc, 1, cd), lambda i: (i, 0, 0))

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0))

    def _flat_act(x):
        # [batch, hw, c] -> [batch*hw, c]: the kernels address flat rows
        return x.reshape(batch * hw, x.shape[-1])

    # ---- forward ----------------------------------------------------------
    fwd_kernel = _fwd_kernel_factory(cfg, down)
    n_chunks_f = batch // cfg.bc_fwd

    def fwd_call(meta, acts, cond, weights, masks):
        bc = cfg.bc_fwd
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        args = [meta]
        for a in acts:
            in_specs.append(act_spec(bc, f))
            args.append(_flat_act(a))
        in_specs.append(cond_spec(bc))
        args.append(cond.reshape(batch, 1, cd))
        for (_, shp), wt in zip(wshapes, weights):
            in_specs.append(full_spec(shp))
            args.append(wt)
        if use_mask_inputs:
            for m in masks:
                in_specs.append(act_spec(bc, 2 * f))
                args.append(_flat_act(m))

        out_specs = [
            act_spec(bc, f), act_spec(bc, f),           # xv', xh'
            act_spec(bc, f), act_spec(bc, f),           # a1v, a1h
            act_spec(bc, 2 * f), act_spec(bc, 2 * f),   # b1v, b1h
        ]
        out_shape = [
            jax.ShapeDtypeStruct((batch * hw, f), cdtype),
            jax.ShapeDtypeStruct((batch * hw, f), cdtype),
            jax.ShapeDtypeStruct((batch * hw, f), cdtype),
            jax.ShapeDtypeStruct((batch * hw, f), cdtype),
            jax.ShapeDtypeStruct((batch * hw, 2 * f), cdtype),
            jax.ShapeDtypeStruct((batch * hw, 2 * f), cdtype),
        ]
        outs = pl.pallas_call(
            fwd_kernel,
            grid=(n_chunks_f,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=cfg.interpret,
            compiler_params=_compiler_params(),
        )(*args)
        return outs

    # ---- backward ---------------------------------------------------------
    bwd_kernel = _bwd_kernel_factory(cfg, down)
    n_chunks_b = batch // cfg.bc_bwd

    def bwd_call(meta, gv, gh, acts, xvn, cond, saves, weights, masks):
        bc = cfg.bc_bwd
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        args = [meta]
        for a in (gv, gh):
            in_specs.append(act_spec(bc, f))
            args.append(a)
        for a in acts:                                   # xv, xh [,skv,skh]
            in_specs.append(act_spec(bc, f))
            args.append(_flat_act(a))
        in_specs.append(act_spec(bc, f))
        args.append(xvn)                                 # already flat
        in_specs.append(cond_spec(bc))
        args.append(cond.reshape(batch, 1, cd))
        for s in saves[:2]:                              # a1v, a1h
            in_specs.append(act_spec(bc, f))
            args.append(s)
        for s in saves[2:]:                              # b1v, b1h
            in_specs.append(act_spec(bc, 2 * f))
            args.append(s)
        bwd_wnames = [n for n, _ in wshapes if not n.startswith("b")]
        wmap = dict(zip([n for n, _ in wshapes], weights))
        shp = dict(wshapes)
        for n in bwd_wnames:
            in_specs.append(full_spec(shp[n]))
            args.append(wmap[n])
        if use_mask_inputs:
            for m in masks:
                in_specs.append(act_spec(bc, 2 * f))
                args.append(_flat_act(m))

        out_specs = [act_spec(bc, f), act_spec(bc, f)]   # dgv, dgh
        out_shape = [
            jax.ShapeDtypeStruct((batch * hw, f), cdtype),
            jax.ShapeDtypeStruct((batch * hw, f), cdtype),
        ]
        if down:
            out_specs += [act_spec(bc, f), act_spec(bc, f)]
            out_shape += [
                jax.ShapeDtypeStruct((batch * hw, f), cdtype),
                jax.ShapeDtypeStruct((batch * hw, f), cdtype),
            ]
        out_specs.append(cond_spec(bc))                  # dcond
        out_shape.append(jax.ShapeDtypeStruct((batch, 1, cd), f32))
        for n, s in wshapes:                             # ALL weight grads
            out_specs.append(full_spec(s))
            out_shape.append(jax.ShapeDtypeStruct(s, f32))

        return pl.pallas_call(
            bwd_kernel,
            grid=(n_chunks_b,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=cfg.interpret,
            compiler_params=_compiler_params(),
        )(*args)

    # ---- custom_vjp -------------------------------------------------------
    n_w = len(wshapes)
    n_m = 2 if use_mask_inputs else 0

    def _split(flat):
        acts = flat[:n_act_in]
        cond = flat[n_act_in]
        weights = flat[n_act_in + 1 : n_act_in + 1 + n_w]
        masks = flat[n_act_in + 1 + n_w :]
        return acts, cond, weights, masks

    @jax.custom_vjp
    def pair(meta, *flat):
        acts, cond, weights, masks = _split(flat)
        outs = fwd_call(meta, acts, cond, weights, masks)
        return outs[0].reshape(batch, hw, f), outs[1].reshape(batch, hw, f)

    def pair_fwd(meta, *flat):
        acts, cond, weights, masks = _split(flat)
        xvn, xhn, a1v, a1h, b1v, b1h = fwd_call(
            meta, acts, cond, weights, masks
        )
        res = (meta, acts, xvn, cond, (a1v, a1h, b1v, b1h), weights, masks)
        return (
            xvn.reshape(batch, hw, f), xhn.reshape(batch, hw, f)
        ), res

    def pair_bwd(res, g):
        meta, acts, xvn, cond, saves, weights, masks = res
        gv, gh = g
        outs = bwd_call(
            meta, _flat_act(gv).astype(cdtype), _flat_act(gh).astype(cdtype),
            acts, xvn, cond, saves, weights, masks,
        )
        it = iter(outs)
        dgv = next(it).reshape(batch, hw, f)
        dgh = next(it).reshape(batch, hw, f)
        grads = [dgv, dgh]
        if down:
            grads.append(next(it).reshape(batch, hw, f))  # dskv
            grads.append(next(it).reshape(batch, hw, f))  # dskh
        dcond = next(it).reshape(batch, cd)
        grads.append(dcond)
        for n, _ in wshapes:
            grads.append(next(it))
        for m in masks:
            grads.append(jnp.zeros_like(m))
        dmeta = np.zeros((2,), jax.dtypes.float0)
        return (dmeta, *grads)

    pair.defvjp(pair_fwd, pair_bwd)
    return pair


def _snap_chunk(bc: int, batch: int) -> int:
    """Largest chunk <= bc that divides batch (grid chunking requires it;
    snapping instead of raising keeps the default-on TPU path safe for
    odd eval batch sizes — worst case bc=1)."""
    bc = min(bc, batch)
    while batch % bc:
        bc -= 1
    return bc


def gated_pair(
    xv: jnp.ndarray,
    xh: jnp.ndarray,
    skips,                        # None (up) or (skv, skh) (down)
    cond: jnp.ndarray,
    weights: dict,
    seed: jnp.ndarray,            # [] or [1] int32 step seed
    pair_index: int,
    *,
    keep: float,
    compute_dtype=jnp.float32,
    bc_fwd: int = 4,
    bc_bwd: int = 2,
    mask_mode: str = "prng",
    masks=None,                   # (mv, mh) [B, H, W, 2F] when mask_mode=input
    interpret: bool = False,
    receptive_field_dims: Tuple[int, int] = (3, 3),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused gated pair (vertical + dependent horizontal block).

    Activations x/skips are [B, H, W, F]; cond is [B, cond_dim]; weights is a
    dict matching :func:`_weight_shapes` names with conv kernels PRE-SLICED
    and flattened to [T*2F, out] and biases [1, out] (aux/cond bias already
    folded).  Returns the pair's (new_vertical, new_horizontal), each
    [B, H, W, F].
    """
    b, h, w, f = xv.shape
    rows_, cols_ = receptive_field_dims
    taps_v = plan_taps((2 * rows_ - 3, cols_), (0, rows_ - 1), (0, cols_))
    taps_h = plan_taps((3, cols_), (0, 2), (0, cols_ // 2 + 1))
    down = skips is not None
    cfg = PairConfig(
        h=h, w=w, f=f, cond_dim=cond.shape[-1],
        taps_v=taps_v, taps_h=taps_h, keep=float(keep),
        cdtype=jnp.dtype(compute_dtype).name,
        bc_fwd=_snap_chunk(bc_fwd, b), bc_bwd=_snap_chunk(bc_bwd, b),
        mask_mode=mask_mode, interpret=interpret,
    )
    pair = _build_pair(cfg, down, b)

    cdtype = jnp.dtype(compute_dtype)
    meta = jnp.stack(
        [jnp.asarray(seed, jnp.int32).reshape(()),
         jnp.asarray(pair_index, jnp.int32)]
    )
    to3 = lambda t: t.reshape(b, h * w, t.shape[-1]).astype(cdtype)
    flat = [to3(xv), to3(xh)]
    if down:
        flat += [to3(skips[0]), to3(skips[1])]
    flat.append(cond.astype(cdtype))
    for name, shp in _weight_shapes(cfg, down):
        wt = weights[name]
        if wt.shape != shp:
            raise ValueError(f"{name}: expected {shp}, got {wt.shape}")
        flat.append(wt.astype(f32) if name.startswith("b") else wt.astype(cdtype))
    if cfg.keep < 1.0 and mask_mode == "input":
        flat += [to3(masks[0]), to3(masks[1])]

    xvn, xhn = pair(meta, *flat)
    back = lambda t: t.reshape(b, h, w, f)
    return back(xvn), back(xhn)


# ---------------------------------------------------------------------------
# Multi-level SEGMENT kernels: L consecutive pair levels in ONE Pallas kernel
# ---------------------------------------------------------------------------
#
# The round-3 device trace (BASELINE.md) put the 48 pair kernels at 8.64 ms
# of the 12.87 ms step with ~40-60 us of per-kernel fixed cost (launch, weight
# DMA ramp, boundary HBM round trips of xv/xh) on top of the ~60-70 us of MXU
# work each.  A segment kernel runs L levels back-to-back with all L levels'
# weights resident and xv/xh carried in VMEM, paying the fixed cost 48/L
# times instead of 48.  Numerics, saves layout, and the PRNG dropout seeding
# are IDENTICAL to the pair kernels (block_id = (base_pair + l)*2 +
# sub_block), so segment and pair paths are interchangeable per checkpoint
# and parity-tested against each other.


def _seg_fwd_kernel_factory(cfg: PairConfig, down: bool, L: int):
    bc = cfg.bc_fwd
    cdtype = jnp.dtype(cfg.cdtype)
    use_mask = cfg.keep < 1.0
    wnames = [n for n, _ in _weight_shapes(cfg, down)]

    def kernel(*refs):
        it = iter(refs)
        meta_ref = next(it)
        xv_ref, xh_ref = next(it), next(it)
        sk_refs = (
            [(next(it), next(it)) for _ in range(L)] if down else None
        )
        cond_ref = next(it)
        w = [
            dict(zip(wnames, (next(it) for _ in wnames))) for _ in range(L)
        ]
        if use_mask and cfg.mask_mode == "input":
            m_refs = [(next(it), next(it)) for _ in range(L)]
        outs = [tuple(next(it) for _ in range(6)) for _ in range(L)]

        cond2d = cond_ref[:].reshape(bc, cfg.cond_dim)
        xv = xv_ref[:]
        xh = xh_ref[:]
        for l in range(L):
            if not use_mask:
                mv = mh = None
            elif cfg.mask_mode == "input":
                mv = m_refs[l][0][:].astype(f32)
                mh = m_refs[l][1][:].astype(f32)
            else:
                mv = _masks_for_chunk(cfg, bc, meta_ref, 0, pair_offset=l)
                mh = _masks_for_chunk(cfg, bc, meta_ref, 1, pair_offset=l)
            wl = w[l]
            aux_v = [(sk_refs[l][0][:], wl["wxv"])] if down else []
            xv_new, a1v, b1v = _block_fwd(
                cfg, cfg.taps_v, bc, xv, aux_v,
                _proj(cond2d, wl["wcv"], cdtype), mv,
                wl["wav"], wl["bav"], wl["wbv"], wl["bbv"],
            )
            aux_h = [(xv_new, wl["wxh_u"])]
            if down:
                aux_h.append((sk_refs[l][1][:], wl["wxh_s"]))
            xh_new, a1h, b1h = _block_fwd(
                cfg, cfg.taps_h, bc, xh, aux_h,
                _proj(cond2d, wl["wch"], cdtype), mh,
                wl["wah"], wl["bah"], wl["wbh"], wl["bbh"],
            )
            xvo, xho, a1v_ref, a1h_ref, b1v_ref, b1h_ref = outs[l]
            xvo[:] = xv_new
            xho[:] = xh_new
            a1v_ref[:] = a1v
            a1h_ref[:] = a1h
            b1v_ref[:] = b1v
            b1h_ref[:] = b1h
            xv, xh = xv_new, xh_new

    return kernel


def _seg_bwd_kernel_factory(cfg: PairConfig, down: bool, L: int):
    bc = cfg.bc_bwd
    cdtype = jnp.dtype(cfg.cdtype)
    use_mask = cfg.keep < 1.0
    hw = cfg.h * cfg.w
    f = cfg.f
    wnames_all = [n for n, _ in _weight_shapes(cfg, down)]
    wnames_bwd = [n for n in wnames_all if not n.startswith("b")]

    def kernel(*refs):
        it = iter(refs)
        meta_ref = next(it)
        g_refs = [(next(it), next(it)) for _ in range(L)]
        xv0_ref, xh0_ref = next(it), next(it)
        xvh_refs = [(next(it), next(it)) for _ in range(L)]
        sk_refs = (
            [(next(it), next(it)) for _ in range(L)] if down else None
        )
        cond_ref = next(it)
        saves = [tuple(next(it) for _ in range(4)) for _ in range(L)]
        w = [
            dict(zip(wnames_bwd, (next(it) for _ in wnames_bwd)))
            for _ in range(L)
        ]
        if use_mask and cfg.mask_mode == "input":
            m_refs = [(next(it), next(it)) for _ in range(L)]
        dgv_ref, dgh_ref = next(it), next(it)
        dsk_refs = (
            [(next(it), next(it)) for _ in range(L)] if down else None
        )
        dcond_ref = next(it)
        dw = [
            dict(zip(wnames_all, (next(it) for _ in wnames_all)))
            for _ in range(L)
        ]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for l in range(L):
                for r in dw[l].values():
                    r[:] = jnp.zeros_like(r)

        cond = cond_ref[:].reshape(bc, cfg.cond_dim).astype(cdtype)
        dcond_total = None
        dv = dh = None
        for l in reversed(range(L)):
            dv_ext = g_refs[l][0][:].astype(f32)
            dh_ext = g_refs[l][1][:].astype(f32)
            dv = dv_ext if dv is None else dv + dv_ext
            dh = dh_ext if dh is None else dh + dh_ext
            if not use_mask:
                mv = mh = None
            elif cfg.mask_mode == "input":
                mv = m_refs[l][0][:].astype(f32)
                mh = m_refs[l][1][:].astype(f32)
            else:
                mv = _masks_for_chunk(cfg, bc, meta_ref, 0, pair_offset=l)
                mh = _masks_for_chunk(cfg, bc, meta_ref, 1, pair_offset=l)
            xv_in = xv0_ref[:] if l == 0 else xvh_refs[l - 1][0][:]
            xh_in = xh0_ref[:] if l == 0 else xvh_refs[l - 1][1][:]
            xv_new = xvh_refs[l][0][:]
            wl, dwl = w[l], dw[l]
            a1v_s, a1h_s, b1v_s, b1h_s = saves[l]

            aux_h = [(xv_new, wl["wxh_u"], dwl["wxh_u"])]
            if down:
                aux_h.append((sk_refs[l][1][:], wl["wxh_s"], dwl["wxh_s"]))
            dxh, dauxes_h, db1h = _block_bwd(
                cfg, cfg.taps_h, bc, dh, xh_in, aux_h, mh,
                a1h_s[:], b1h_s[:], wl["wah"], wl["wbh"],
                dwl["wah"], dwl["bah"], dwl["wbh"], dwl["bbh"],
            )
            rs_h = db1h.reshape(bc, hw, 2 * f).sum(axis=1)
            dwl["wch"][:] += _dot_t(cond, rs_h.astype(cdtype))
            if down:
                dsk_refs[l][1][:] = dauxes_h[1].astype(dsk_refs[l][1].dtype)

            gv_total = dv + dauxes_h[0]
            aux_v = (
                [(sk_refs[l][0][:], wl["wxv"], dwl["wxv"])] if down else []
            )
            dxv, dauxes_v, db1v = _block_bwd(
                cfg, cfg.taps_v, bc, gv_total, xv_in, aux_v, mv,
                a1v_s[:], b1v_s[:], wl["wav"], wl["wbv"],
                dwl["wav"], dwl["bav"], dwl["wbv"], dwl["bbv"],
            )
            rs_v = db1v.reshape(bc, hw, 2 * f).sum(axis=1)
            dwl["wcv"][:] += _dot_t(cond, rs_v.astype(cdtype))
            if down:
                dsk_refs[l][0][:] = dauxes_v[0].astype(dsk_refs[l][0].dtype)

            dc = _dot(rs_v.astype(cdtype), wl["wcv"][:].astype(cdtype).T)
            dc = dc + _dot(rs_h.astype(cdtype), wl["wch"][:].astype(cdtype).T)
            dcond_total = dc if dcond_total is None else dcond_total + dc
            dv, dh = dxv, dxh

        dgv_ref[:] = dv.astype(dgv_ref.dtype)
        dgh_ref[:] = dh.astype(dgh_ref.dtype)
        dcond_ref[:] = dcond_total.reshape(bc, 1, cfg.cond_dim).astype(
            dcond_ref.dtype
        )

    return kernel


@functools.lru_cache(maxsize=32)
def _build_segment(cfg: PairConfig, down: bool, batch: int, L: int):
    """Builds the custom_vjp'd SEGMENT function for one static config.

    Returned callable signature (all arrays)::

        fn(meta, xv, xh, [skv_0, skh_0, ..., skv_{L-1}, skh_{L-1},] cond,
           *weights_level_major [, mv_0, mh_0, ..., mv_{L-1}, mh_{L-1}])
        -> ((xv_0, xh_0), ..., (xv_{L-1}, xh_{L-1}))

    meta: [2] int32 = (step_seed, BASE pair index of the segment).  Per-level
    outputs are returned so the down pass can consume up outputs as skips;
    unconsumed outputs get zero cotangents and the backward kernel adds the
    per-level cotangents into the in-kernel chain backprop.
    """
    h, w, f, cd = cfg.h, cfg.w, cfg.f, cfg.cond_dim
    hw = h * w
    cdtype = jnp.dtype(cfg.cdtype)
    use_mask_inputs = cfg.keep < 1.0 and cfg.mask_mode == "input"
    wshapes = _weight_shapes(cfg, down)
    wnames_all = [n for n, _ in wshapes]
    wnames_bwd = [n for n in wnames_all if not n.startswith("b")]
    shp = dict(wshapes)
    n_w = len(wshapes)

    if batch % cfg.bc_fwd or batch % cfg.bc_bwd:
        raise ValueError(
            f"batch {batch} not divisible by chunk sizes "
            f"({cfg.bc_fwd}, {cfg.bc_bwd})"
        )

    def act_spec(bc, cols):
        return pl.BlockSpec((bc * hw, cols), lambda i: (i, 0))

    def cond_spec(bc):
        return pl.BlockSpec((bc, 1, cd), lambda i: (i, 0, 0))

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0))

    def _flat_act(x):
        return x.reshape(batch * hw, x.shape[-1])

    # ---- forward ----------------------------------------------------------
    fwd_kernel = _seg_fwd_kernel_factory(cfg, down, L)
    n_chunks_f = batch // cfg.bc_fwd

    def fwd_call(meta, xv, xh, skips, cond, weights, masks):
        bc = cfg.bc_fwd
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        args = [meta]
        for a in (xv, xh):
            in_specs.append(act_spec(bc, f))
            args.append(_flat_act(a))
        if down:
            for skv, skh in skips:
                in_specs.append(act_spec(bc, f))
                args.append(_flat_act(skv))
                in_specs.append(act_spec(bc, f))
                args.append(_flat_act(skh))
        in_specs.append(cond_spec(bc))
        args.append(cond.reshape(batch, 1, cd))
        for wl in weights:                     # level-major
            for n in wnames_all:
                in_specs.append(full_spec(shp[n]))
                args.append(wl[n])
        if use_mask_inputs:
            for mv, mh in masks:
                in_specs.append(act_spec(bc, 2 * f))
                args.append(_flat_act(mv))
                in_specs.append(act_spec(bc, 2 * f))
                args.append(_flat_act(mh))

        out_specs, out_shape = [], []
        for _ in range(L):
            for cols in (f, f, f, f, 2 * f, 2 * f):  # xv,xh,a1v,a1h,b1v,b1h
                out_specs.append(act_spec(bc, cols))
                out_shape.append(
                    jax.ShapeDtypeStruct((batch * hw, cols), cdtype)
                )
        return pl.pallas_call(
            fwd_kernel,
            grid=(n_chunks_f,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=cfg.interpret,
            compiler_params=_compiler_params(L),
        )(*args)

    # ---- backward ---------------------------------------------------------
    bwd_kernel = _seg_bwd_kernel_factory(cfg, down, L)
    n_chunks_b = batch // cfg.bc_bwd

    def bwd_call(meta, gs, xv0, xh0, level_outs, skips, cond, saves,
                 weights, masks):
        bc = cfg.bc_bwd
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        args = [meta]
        for gv, gh in gs:
            in_specs.append(act_spec(bc, f))
            args.append(gv)
            in_specs.append(act_spec(bc, f))
            args.append(gh)
        for a in (xv0, xh0):
            in_specs.append(act_spec(bc, f))
            args.append(_flat_act(a))
        for xvl, xhl in level_outs:            # already flat
            in_specs.append(act_spec(bc, f))
            args.append(xvl)
            in_specs.append(act_spec(bc, f))
            args.append(xhl)
        if down:
            for skv, skh in skips:
                in_specs.append(act_spec(bc, f))
                args.append(_flat_act(skv))
                in_specs.append(act_spec(bc, f))
                args.append(_flat_act(skh))
        in_specs.append(cond_spec(bc))
        args.append(cond.reshape(batch, 1, cd))
        for a1v, a1h, b1v, b1h in saves:       # already flat
            in_specs.append(act_spec(bc, f))
            args.append(a1v)
            in_specs.append(act_spec(bc, f))
            args.append(a1h)
            in_specs.append(act_spec(bc, 2 * f))
            args.append(b1v)
            in_specs.append(act_spec(bc, 2 * f))
            args.append(b1h)
        for wl in weights:
            for n in wnames_bwd:
                in_specs.append(full_spec(shp[n]))
                args.append(wl[n])
        if use_mask_inputs:
            for mv, mh in masks:
                in_specs.append(act_spec(bc, 2 * f))
                args.append(_flat_act(mv))
                in_specs.append(act_spec(bc, 2 * f))
                args.append(_flat_act(mh))

        out_specs = [act_spec(bc, f), act_spec(bc, f)]   # dxv0, dxh0
        out_shape = [
            jax.ShapeDtypeStruct((batch * hw, f), cdtype),
            jax.ShapeDtypeStruct((batch * hw, f), cdtype),
        ]
        if down:
            for _ in range(L):
                out_specs += [act_spec(bc, f), act_spec(bc, f)]
                out_shape += [
                    jax.ShapeDtypeStruct((batch * hw, f), cdtype),
                    jax.ShapeDtypeStruct((batch * hw, f), cdtype),
                ]
        out_specs.append(cond_spec(bc))
        out_shape.append(jax.ShapeDtypeStruct((batch, 1, cd), f32))
        for _ in range(L):
            for n, s in wshapes:
                out_specs.append(full_spec(s))
                out_shape.append(jax.ShapeDtypeStruct(s, f32))

        return pl.pallas_call(
            bwd_kernel,
            grid=(n_chunks_b,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=cfg.interpret,
            compiler_params=_compiler_params(L),
        )(*args)

    # ---- custom_vjp -------------------------------------------------------
    n_sk = 2 * L if down else 0
    n_m = 2 * L if use_mask_inputs else 0

    def _split(flat):
        xv, xh = flat[0], flat[1]
        skips = [
            (flat[2 + 2 * i], flat[3 + 2 * i]) for i in range(L)
        ] if down else None
        cond = flat[2 + n_sk]
        woff = 3 + n_sk
        weights = [
            dict(zip(wnames_all, flat[woff + l * n_w : woff + (l + 1) * n_w]))
            for l in range(L)
        ]
        moff = woff + L * n_w
        masks = [
            (flat[moff + 2 * i], flat[moff + 2 * i + 1]) for i in range(L)
        ] if use_mask_inputs else None
        return xv, xh, skips, cond, weights, masks

    def _level_views(outs):
        """fwd_call's flat outputs -> per-level (xv, xh) and saves."""
        level_outs = [(outs[6 * l], outs[6 * l + 1]) for l in range(L)]
        saves = [tuple(outs[6 * l + 2 : 6 * l + 6]) for l in range(L)]
        return level_outs, saves

    def _reshape_pairs(level_outs):
        return tuple(
            (xv.reshape(batch, hw, f), xh.reshape(batch, hw, f))
            for xv, xh in level_outs
        )

    @jax.custom_vjp
    def segment(meta, *flat):
        xv, xh, skips, cond, weights, masks = _split(flat)
        outs = fwd_call(meta, xv, xh, skips, cond, weights, masks)
        level_outs, _ = _level_views(outs)
        return _reshape_pairs(level_outs)

    def segment_fwd(meta, *flat):
        xv, xh, skips, cond, weights, masks = _split(flat)
        outs = fwd_call(meta, xv, xh, skips, cond, weights, masks)
        level_outs, saves = _level_views(outs)
        res = (meta, xv, xh, skips, cond, level_outs, saves, weights, masks)
        return _reshape_pairs(level_outs), res

    def segment_bwd(res, g):
        meta, xv, xh, skips, cond, level_outs, saves, weights, masks = res
        gs = [
            (_flat_act(gv).astype(cdtype), _flat_act(gh).astype(cdtype))
            for gv, gh in g
        ]
        outs = bwd_call(
            meta, gs, xv, xh, level_outs, skips, cond, saves, weights, masks
        )
        it = iter(outs)
        grads = [
            next(it).reshape(batch, hw, f),      # dxv0
            next(it).reshape(batch, hw, f),      # dxh0
        ]
        if down:
            for _ in range(L):
                grads.append(next(it).reshape(batch, hw, f))   # dskv_l
                grads.append(next(it).reshape(batch, hw, f))   # dskh_l
        grads.append(next(it).reshape(batch, cd))              # dcond
        for _ in range(L):
            for n in wnames_all:
                grads.append(next(it))
        if use_mask_inputs:
            for mv, mh in masks:
                grads.append(jnp.zeros_like(mv))
                grads.append(jnp.zeros_like(mh))
        dmeta = np.zeros((2,), jax.dtypes.float0)
        return (dmeta, *grads)

    segment.defvjp(segment_fwd, segment_bwd)
    return segment


def gated_segment(
    xv: jnp.ndarray,
    xh: jnp.ndarray,
    skips,                        # None (up) or [(skv_l, skh_l)] * L (down)
    cond: jnp.ndarray,
    weights,                      # [dict] * L matching _weight_shapes names
    seed: jnp.ndarray,
    base_pair_index: int,
    *,
    keep: float,
    compute_dtype=jnp.float32,
    bc_fwd: int = 4,
    bc_bwd: int = 2,
    mask_mode: str = "prng",
    masks=None,                   # [(mv_l, mh_l)] * L when mask_mode=input
    interpret: bool = False,
    receptive_field_dims: Tuple[int, int] = (3, 3),
):
    """L consecutive gated-pair levels as ONE fused fwd kernel + ONE bwd
    kernel. Drop-in equivalent of L sequential :func:`gated_pair` calls with
    pair indices ``base_pair_index .. base_pair_index + L - 1`` (identical
    numerics, saves, and PRNG dropout bits — parity-tested). Returns the
    per-level ``(new_vertical, new_horizontal)`` tuples, each [B, H, W, F],
    so up outputs remain addressable as down-pass skips."""
    b, h, w, f = xv.shape
    L = len(weights)
    rows_, cols_ = receptive_field_dims
    taps_v = plan_taps((2 * rows_ - 3, cols_), (0, rows_ - 1), (0, cols_))
    taps_h = plan_taps((3, cols_), (0, 2), (0, cols_ // 2 + 1))
    down = skips is not None
    cfg = PairConfig(
        h=h, w=w, f=f, cond_dim=cond.shape[-1],
        taps_v=taps_v, taps_h=taps_h, keep=float(keep),
        cdtype=jnp.dtype(compute_dtype).name,
        bc_fwd=_snap_chunk(bc_fwd, b), bc_bwd=_snap_chunk(bc_bwd, b),
        mask_mode=mask_mode, interpret=interpret,
    )
    seg = _build_segment(cfg, down, b, L)

    cdtype = jnp.dtype(compute_dtype)
    meta = jnp.stack(
        [jnp.asarray(seed, jnp.int32).reshape(()),
         jnp.asarray(base_pair_index, jnp.int32)]
    )
    to3 = lambda t: t.reshape(b, h * w, t.shape[-1]).astype(cdtype)
    flat = [to3(xv), to3(xh)]
    if down:
        for skv, skh in skips:
            flat += [to3(skv), to3(skh)]
    flat.append(cond.astype(cdtype))
    for wl in weights:
        for name, shp_ in _weight_shapes(cfg, down):
            wt = wl[name]
            if wt.shape != shp_:
                raise ValueError(f"{name}: expected {shp_}, got {wt.shape}")
            flat.append(
                wt.astype(f32) if name.startswith("b") else wt.astype(cdtype)
            )
    if cfg.keep < 1.0 and mask_mode == "input":
        for mv, mh in masks:
            flat += [to3(mv), to3(mh)]

    outs = seg(meta, *flat)
    back = lambda t: t.reshape(b, h, w, f)
    return [(back(xvl), back(xhl)) for xvl, xhl in outs]


# ---------------------------------------------------------------------------
# STREAMED chain kernels: the whole L-level chain in ONE kernel per direction,
# pair-sized VMEM
# ---------------------------------------------------------------------------
#
# The round-3 on-chip A/B (BASELINE.md) showed why resident SEGMENT kernels
# lose: L=4 holds ~65 MB of live VMEM (L levels' weights + saves), which
# starves Mosaic's grid double-buffering — fewer launches don't pay for the
# lost DMA/compute overlap.  The streamed kernels instead grid over
# ``(level, chunk)`` with the chunk axis fastest:
#
# - per-level weights are STACKED to rank-3 ``[L, rows, cols]`` arrays and
#   streamed by the level grid index (``(1, rows, cols)`` blocks — the tail
#   equals the array's, the same Mosaic tiling rule ``cond_spec`` exploits),
#   so exactly ONE level's weights are resident, with Mosaic prefetching the
#   next level's during compute;
# - the xv/xh carry between levels lives in a full-batch VMEM scratch
#   (forward) — the backward carries dv/dh the same way — so the only HBM
#   activation traffic is the per-level saves the backward needs anyway;
# - per-level weight GRADIENTS accumulate in a resident output block: with
#   the chunk axis fastest, all chunk visits of one level are consecutive,
#   so Mosaic keeps the dW block in VMEM across the sweep and flushes it
#   once per level (the standard Pallas accumulation pattern, per level
#   instead of per call).
#
# Numerics, saves, and PRNG dropout seeding are IDENTICAL to the pair path
# (block_id = (base_pair + level)*2 + sub_block with the level index now a
# traced grid value), so pair / segment / streamed are interchangeable per
# checkpoint and parity-tested against each other.  One kernel call covers
# the full up pass and one the full down pass: 48 pair launches -> 4.


class _Lvl:
    """Adapter presenting one level's ``[1, rows, cols]`` block of a stacked
    rank-3 ref as the rank-2 ref the pair helpers address."""

    __slots__ = ("ref",)

    def __init__(self, ref):
        self.ref = ref

    def _idx(self, idx):
        return (0, *(idx if isinstance(idx, tuple) else (idx,)))

    def __getitem__(self, idx):
        return self.ref[self._idx(idx)]

    def __setitem__(self, idx, value):
        self.ref[self._idx(idx)] = value

    @property
    def dtype(self):
        return self.ref.dtype


def _stream_fwd_kernel_factory(cfg: PairConfig, down: bool, L: int):
    bc = cfg.bc_fwd
    bchw = bc * cfg.h * cfg.w
    cdtype = jnp.dtype(cfg.cdtype)
    use_mask = cfg.keep < 1.0
    wnames = [n for n, _ in _weight_shapes(cfg, down)]

    def kernel(*refs):
        it = iter(refs)
        meta_ref = next(it)
        xv0_ref, xh0_ref = next(it), next(it)
        if down:
            skv_ref, skh_ref = next(it), next(it)
        cond_ref = next(it)
        w = {n: _Lvl(next(it)) for n in wnames}
        if use_mask and cfg.mask_mode == "input":
            mv_ref, mh_ref = next(it), next(it)
        (xvi_ref, xhi_ref, xvo_ref, xho_ref,
         a1v_ref, a1h_ref, b1v_ref, b1h_ref) = (next(it) for _ in range(8))
        xv_scr, xh_scr = next(it), next(it)

        l = pl.program_id(0)
        i = pl.program_id(1)
        rows = pl.ds(i * bchw, bchw)

        if not use_mask:
            mv = mh = None
        elif cfg.mask_mode == "input":
            mv = mv_ref[:].astype(f32)
            mh = mh_ref[:].astype(f32)
        else:
            mv = _masks_for_chunk(cfg, bc, meta_ref, 0, pair_offset=l,
                                  chunk_pid=i)
            mh = _masks_for_chunk(cfg, bc, meta_ref, 1, pair_offset=l,
                                  chunk_pid=i)

        # level 0 reads the chain input; later levels read the VMEM carry
        xv = jnp.where(l == 0, xv0_ref[:], xv_scr[rows])
        xh = jnp.where(l == 0, xh0_ref[:], xh_scr[rows])

        cond2d = cond_ref[:].reshape(bc, cfg.cond_dim)
        aux_v = [(skv_ref[:], w["wxv"])] if down else []
        xv_new, a1v, b1v = _block_fwd(
            cfg, cfg.taps_v, bc, xv, aux_v,
            _proj(cond2d, w["wcv"], cdtype), mv,
            w["wav"], w["bav"], w["wbv"], w["bbv"],
        )
        aux_h = [(xv_new, w["wxh_u"])]
        if down:
            aux_h.append((skh_ref[:], w["wxh_s"]))
        xh_new, a1h, b1h = _block_fwd(
            cfg, cfg.taps_h, bc, xh, aux_h,
            _proj(cond2d, w["wch"], cdtype), mh,
            w["wah"], w["bah"], w["wbh"], w["bbh"],
        )

        xvi_ref[:] = xv
        xhi_ref[:] = xh
        xvo_ref[:] = xv_new
        xho_ref[:] = xh_new
        a1v_ref[:] = a1v
        a1h_ref[:] = a1h
        b1v_ref[:] = b1v
        b1h_ref[:] = b1h
        xv_scr[rows] = xv_new
        xh_scr[rows] = xh_new

    return kernel


def _stream_bwd_kernel_factory(cfg: PairConfig, down: bool, L: int):
    bc = cfg.bc_bwd
    bchw = bc * cfg.h * cfg.w
    cdtype = jnp.dtype(cfg.cdtype)
    use_mask = cfg.keep < 1.0
    hw = cfg.h * cfg.w
    f = cfg.f
    wnames_all = [n for n, _ in _weight_shapes(cfg, down)]
    wnames_bwd = [n for n in wnames_all if not n.startswith("b")]

    def kernel(*refs):
        it = iter(refs)
        meta_ref = next(it)
        gv_ref, gh_ref = next(it), next(it)
        xvi_ref, xhi_ref, xvn_ref = next(it), next(it), next(it)
        if down:
            skv_ref, skh_ref = next(it), next(it)
        cond_ref = next(it)
        a1v_ref, a1h_ref, b1v_ref, b1h_ref = (next(it) for _ in range(4))
        w = {n: _Lvl(next(it)) for n in wnames_bwd}
        if use_mask and cfg.mask_mode == "input":
            mv_ref, mh_ref = next(it), next(it)
        dgv_ref, dgh_ref = next(it), next(it)
        if down:
            dskv_ref, dskh_ref = next(it), next(it)
        dcond_ref = next(it)
        dw = {n: _Lvl(next(it)) for n in wnames_all}
        dv_scr, dh_scr = next(it), next(it)

        j = pl.program_id(0)          # reversed: actual level = L - 1 - j
        i = pl.program_id(1)
        l = (L - 1) - j
        rows = pl.ds(i * bchw, bchw)

        @pl.when(i == 0)
        def _init():
            for ad in dw.values():
                ad.ref[:] = jnp.zeros(ad.ref.shape, ad.ref.dtype)

        if not use_mask:
            mv = mh = None
        elif cfg.mask_mode == "input":
            mv = mv_ref[:].astype(f32)
            mh = mh_ref[:].astype(f32)
        else:
            mv = _masks_for_chunk(cfg, bc, meta_ref, 0, pair_offset=l,
                                  chunk_pid=i)
            mh = _masks_for_chunk(cfg, bc, meta_ref, 1, pair_offset=l,
                                  chunk_pid=i)

        # external cotangent for this level's outputs + the chain carry
        # (zero at the last level); matches the segment kernel's
        # ``dv + dv_ext`` f32 addition order.
        dv_ext = gv_ref[:].astype(f32)
        dh_ext = gh_ref[:].astype(f32)
        dv = jnp.where(j == 0, dv_ext, dv_scr[rows].astype(f32) + dv_ext)
        dh = jnp.where(j == 0, dh_ext, dh_scr[rows].astype(f32) + dh_ext)

        cond = cond_ref[:].reshape(bc, cfg.cond_dim).astype(cdtype)
        xv_in = xvi_ref[:]
        xh_in = xhi_ref[:]
        xv_new = xvn_ref[:]

        aux_h = [(xv_new, w["wxh_u"], dw["wxh_u"])]
        if down:
            aux_h.append((skh_ref[:], w["wxh_s"], dw["wxh_s"]))
        dxh, dauxes_h, db1h = _block_bwd(
            cfg, cfg.taps_h, bc, dh, xh_in, aux_h, mh,
            a1h_ref[:], b1h_ref[:], w["wah"], w["wbh"],
            dw["wah"], dw["bah"], dw["wbh"], dw["bbh"],
        )
        rs_h = db1h.reshape(bc, hw, 2 * f).sum(axis=1)
        dw["wch"][:] += _dot_t(cond, rs_h.astype(cdtype))
        if down:
            dskh_ref[:] = dauxes_h[1].astype(dskh_ref.dtype)

        gv_total = dv + dauxes_h[0]
        aux_v = [(skv_ref[:], w["wxv"], dw["wxv"])] if down else []
        dxv, dauxes_v, db1v = _block_bwd(
            cfg, cfg.taps_v, bc, gv_total, xv_in, aux_v, mv,
            a1v_ref[:], b1v_ref[:], w["wav"], w["wbv"],
            dw["wav"], dw["bav"], dw["wbv"], dw["bbv"],
        )
        rs_v = db1v.reshape(bc, hw, 2 * f).sum(axis=1)
        dw["wcv"][:] += _dot_t(cond, rs_v.astype(cdtype))
        if down:
            dskv_ref[:] = dauxes_v[0].astype(dskv_ref.dtype)

        dc = _dot(rs_v.astype(cdtype), w["wcv"][:].astype(cdtype).T) + _dot(
            rs_h.astype(cdtype), w["wch"][:].astype(cdtype).T
        )
        dcond_ref[:] = dc.reshape(bc, 1, cfg.cond_dim).astype(dcond_ref.dtype)

        dgv_ref[:] = dxv.astype(dgv_ref.dtype)
        dgh_ref[:] = dxh.astype(dgh_ref.dtype)
        dv_scr[rows] = dxv.astype(cdtype)
        dh_scr[rows] = dxh.astype(cdtype)

    return kernel


@functools.lru_cache(maxsize=32)
def _build_stream(cfg: PairConfig, down: bool, batch: int, L: int):
    """Builds the custom_vjp'd STREAMED chain for one static config.

    Returned callable signature (kernel-native layouts)::

        fn(meta, xv0, xh0, [skv_s, skh_s,] cond, *stacked_weights
           [, mv_s, mh_s]) -> (xv_outs, xh_outs)

    Activations/saves are flat-stacked ``[L*batch*hw, cols]`` (level-major);
    weights are rank-3 ``[L, rows, cols]`` stacks of the pair weights; cond
    is ``[batch, cond_dim]``.  meta: [2] int32 = (step_seed, BASE pair
    index).  Returns the stacked per-level outputs; external cotangents for
    any level (skip consumers) enter through the stacked output cotangent.
    """
    h, w, f, cd = cfg.h, cfg.w, cfg.f, cfg.cond_dim
    hw = h * w
    cdtype = jnp.dtype(cfg.cdtype)
    use_mask_inputs = cfg.keep < 1.0 and cfg.mask_mode == "input"
    wshapes = _weight_shapes(cfg, down)
    wnames_all = [n for n, _ in wshapes]
    wnames_bwd = [n for n in wnames_all if not n.startswith("b")]
    shp = dict(wshapes)
    n_w = len(wshapes)

    if batch % cfg.bc_fwd or batch % cfg.bc_bwd:
        raise ValueError(
            f"batch {batch} not divisible by chunk sizes "
            f"({cfg.bc_fwd}, {cfg.bc_bwd})"
        )
    ncf = batch // cfg.bc_fwd
    ncb = batch // cfg.bc_bwd

    def chunk_spec(bc, cols):
        # chain input/output: one batch chunk, same block for every level
        return pl.BlockSpec((bc * hw, cols), lambda l, i: (i, 0))

    def lvl_spec(bc, cols, nc, rev=False):
        # level-major stacked activations [L*batch*hw, cols]
        if rev:
            return pl.BlockSpec(
                (bc * hw, cols), lambda l, i: ((L - 1 - l) * nc + i, 0)
            )
        return pl.BlockSpec((bc * hw, cols), lambda l, i: (l * nc + i, 0))

    def w_spec(name, rev=False):
        rows, cols = shp[name]
        if rev:
            return pl.BlockSpec(
                (1, rows, cols), lambda l, i: (L - 1 - l, 0, 0)
            )
        return pl.BlockSpec((1, rows, cols), lambda l, i: (l, 0, 0))

    def cond_spec(bc):
        return pl.BlockSpec((bc, 1, cd), lambda l, i: (i, 0, 0))

    # ---- forward ----------------------------------------------------------
    fwd_kernel = _stream_fwd_kernel_factory(cfg, down, L)

    def fwd_call(meta, xv0, xh0, skips_s, cond, weights_s, masks_s):
        bc = cfg.bc_fwd
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        args = [meta]
        for a in (xv0, xh0):
            in_specs.append(chunk_spec(bc, f))
            args.append(a)
        if down:
            for a in skips_s:
                in_specs.append(lvl_spec(bc, f, ncf))
                args.append(a)
        in_specs.append(cond_spec(bc))
        args.append(cond.reshape(batch, 1, cd))
        for n in wnames_all:
            in_specs.append(w_spec(n))
            args.append(weights_s[n])
        if use_mask_inputs:
            for m in masks_s:
                in_specs.append(lvl_spec(bc, 2 * f, ncf))
                args.append(m)

        out_specs, out_shape = [], []
        for cols in (f, f, f, f, f, f, 2 * f, 2 * f):
            # xvi, xhi, xvo, xho, a1v, a1h, b1v, b1h
            out_specs.append(lvl_spec(bc, cols, ncf))
            out_shape.append(
                jax.ShapeDtypeStruct((L * batch * hw, cols), cdtype)
            )
        return pl.pallas_call(
            fwd_kernel,
            grid=(L, ncf),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((batch * hw, f), cdtype),
                pltpu.VMEM((batch * hw, f), cdtype),
            ],
            interpret=cfg.interpret,
            compiler_params=_compiler_params(),
        )(*args)

    # ---- backward ---------------------------------------------------------
    bwd_kernel = _stream_bwd_kernel_factory(cfg, down, L)

    def bwd_call(meta, gv_s, gh_s, saves, skips_s, cond, weights_s, masks_s):
        bc = cfg.bc_bwd
        xvi, xhi, xvo, a1v, a1h, b1v, b1h = saves
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        args = [meta]
        for a in (gv_s, gh_s, xvi, xhi, xvo):
            in_specs.append(lvl_spec(bc, f, ncb, rev=True))
            args.append(a)
        if down:
            for a in skips_s:
                in_specs.append(lvl_spec(bc, f, ncb, rev=True))
                args.append(a)
        in_specs.append(cond_spec(bc))
        args.append(cond.reshape(batch, 1, cd))
        for a, cols in ((a1v, f), (a1h, f), (b1v, 2 * f), (b1h, 2 * f)):
            in_specs.append(lvl_spec(bc, cols, ncb, rev=True))
            args.append(a)
        for n in wnames_bwd:
            in_specs.append(w_spec(n, rev=True))
            args.append(weights_s[n])
        if use_mask_inputs:
            for m in masks_s:
                in_specs.append(lvl_spec(bc, 2 * f, ncb, rev=True))
                args.append(m)

        out_specs = [chunk_spec(bc, f), chunk_spec(bc, f)]   # dgv, dgh
        out_shape = [
            jax.ShapeDtypeStruct((batch * hw, f), cdtype),
            jax.ShapeDtypeStruct((batch * hw, f), cdtype),
        ]
        if down:
            for _ in range(2):                               # dskv_s, dskh_s
                out_specs.append(lvl_spec(bc, f, ncb, rev=True))
                out_shape.append(
                    jax.ShapeDtypeStruct((L * batch * hw, f), cdtype)
                )
        # per-(level, chunk) dcond blocks, summed over levels outside
        out_specs.append(
            pl.BlockSpec(
                (bc, 1, cd), lambda l, i: ((L - 1 - l) * ncb + i, 0, 0)
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((L * batch, 1, cd), f32))
        for n in wnames_all:                                 # stacked dW
            rows, cols = shp[n]
            out_specs.append(w_spec(n, rev=True))
            out_shape.append(jax.ShapeDtypeStruct((L, rows, cols), f32))

        return pl.pallas_call(
            bwd_kernel,
            grid=(L, ncb),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((batch * hw, f), cdtype),
                pltpu.VMEM((batch * hw, f), cdtype),
            ],
            interpret=cfg.interpret,
            compiler_params=_compiler_params(),
        )(*args)

    # ---- custom_vjp -------------------------------------------------------
    n_sk = 2 if down else 0

    def _split(flat):
        xv0, xh0 = flat[0], flat[1]
        skips_s = (flat[2], flat[3]) if down else None
        cond = flat[2 + n_sk]
        woff = 3 + n_sk
        weights_s = dict(zip(wnames_all, flat[woff : woff + n_w]))
        masks_s = flat[woff + n_w :] if use_mask_inputs else None
        return xv0, xh0, skips_s, cond, weights_s, masks_s

    @jax.custom_vjp
    def stream(meta, *flat):
        xv0, xh0, skips_s, cond, weights_s, masks_s = _split(flat)
        outs = fwd_call(meta, xv0, xh0, skips_s, cond, weights_s, masks_s)
        return outs[2], outs[3]

    def stream_fwd(meta, *flat):
        xv0, xh0, skips_s, cond, weights_s, masks_s = _split(flat)
        outs = fwd_call(meta, xv0, xh0, skips_s, cond, weights_s, masks_s)
        xvi, xhi, xvo, xho, a1v, a1h, b1v, b1h = outs
        saves = (xvi, xhi, xvo, a1v, a1h, b1v, b1h)
        res = (meta, saves, skips_s, cond, weights_s, masks_s)
        return (xvo, xho), res

    def stream_bwd(res, g):
        meta, saves, skips_s, cond, weights_s, masks_s = res
        gv_s, gh_s = (t.astype(cdtype) for t in g)
        outs = bwd_call(
            meta, gv_s, gh_s, saves, skips_s, cond, weights_s, masks_s
        )
        it = iter(outs)
        grads = [next(it), next(it)]                  # dxv0, dxh0
        if down:
            grads.append(next(it))                    # dskv_s
            grads.append(next(it))                    # dskh_s
        dcond = next(it).reshape(L, batch, cd).sum(axis=0)
        grads.append(dcond)
        for _ in wnames_all:
            grads.append(next(it))
        if use_mask_inputs:
            for m in masks_s:
                grads.append(jnp.zeros_like(m))
        dmeta = np.zeros((2,), jax.dtypes.float0)
        return (dmeta, *grads)

    stream.defvjp(stream_fwd, stream_bwd)
    return stream


def gated_stream(
    xv: jnp.ndarray,
    xh: jnp.ndarray,
    skips,                        # None (up) or [(skv_l, skh_l)] * L (down)
    cond: jnp.ndarray,
    weights,                      # [dict] * L matching _weight_shapes names
    seed: jnp.ndarray,
    base_pair_index: int,
    *,
    keep: float,
    compute_dtype=jnp.float32,
    bc_fwd: int = 4,
    bc_bwd: int = 2,
    mask_mode: str = "prng",
    masks=None,                   # [(mv_l, mh_l)] * L when mask_mode=input
    interpret: bool = False,
    receptive_field_dims: Tuple[int, int] = (3, 3),
):
    """L consecutive gated-pair levels as ONE streamed fwd kernel + ONE
    streamed bwd kernel (grid over (level, chunk), per-level weights
    streamed, xv/xh carried in VMEM scratch).  Drop-in equivalent of L
    sequential :func:`gated_pair` calls with pair indices
    ``base_pair_index .. base_pair_index + L - 1``: identical PRNG dropout
    bits always; identical numerics at float32 compute.  At bfloat16
    compute the equivalence holds to bf16 tolerance only — this kernel
    carries the inter-level forward activations and backward cotangents in
    COMPUTE dtype (dv_scr/dh_scr), while the pair path rounds each level
    boundary through HBM and the segment kernel keeps f32 carries within a
    launch.  Returns the per-level
    ``(new_vertical, new_horizontal)`` tuples, each [B, H, W, F]."""
    b, h, w_, f = xv.shape
    hw = h * w_
    # ``weights`` is either a per-level list of dicts (stacked here — one
    # jnp.stack per weight name per step) or a dict of ALREADY-STACKED
    # [L, rows, cols] arrays (the packed-params training path,
    # models/pixelcnn.py::pack_chain_params — zero per-step stacking).
    prestacked = isinstance(weights, dict)
    if prestacked:
        L = int(next(iter(weights.values())).shape[0])
    else:
        L = len(weights)
    rows_, cols_ = receptive_field_dims
    taps_v = plan_taps((2 * rows_ - 3, cols_), (0, rows_ - 1), (0, cols_))
    taps_h = plan_taps((3, cols_), (0, 2), (0, cols_ // 2 + 1))
    down = skips is not None
    cfg = PairConfig(
        h=h, w=w_, f=f, cond_dim=cond.shape[-1],
        taps_v=taps_v, taps_h=taps_h, keep=float(keep),
        cdtype=jnp.dtype(compute_dtype).name,
        bc_fwd=_snap_chunk(bc_fwd, b), bc_bwd=_snap_chunk(bc_bwd, b),
        mask_mode=mask_mode, interpret=interpret,
    )
    fn = _build_stream(cfg, down, b, L)

    cdtype = jnp.dtype(compute_dtype)
    meta = jnp.stack(
        [jnp.asarray(seed, jnp.int32).reshape(()),
         jnp.asarray(base_pair_index, jnp.int32)]
    )
    flat2 = lambda t: t.reshape(b * hw, t.shape[-1]).astype(cdtype)
    stack2 = lambda ts: jnp.concatenate([flat2(t) for t in ts], axis=0)
    flat = [flat2(xv), flat2(xh)]
    if down:
        flat.append(stack2([skv for skv, _ in skips]))
        flat.append(stack2([skh for _, skh in skips]))
    flat.append(cond.astype(cdtype))
    for name, shp_ in _weight_shapes(cfg, down):
        if prestacked:
            wt = weights[name]
            if wt.shape != (L, *shp_):
                raise ValueError(
                    f"{name}: expected {(L, *shp_)}, got {wt.shape}"
                )
            flat.append(
                wt.astype(f32) if name.startswith("b") else wt.astype(cdtype)
            )
            continue
        ws = []
        for wl in weights:
            wt = wl[name]
            if wt.shape != shp_:
                raise ValueError(f"{name}: expected {shp_}, got {wt.shape}")
            ws.append(
                wt.astype(f32) if name.startswith("b") else wt.astype(cdtype)
            )
        flat.append(jnp.stack(ws))
    if cfg.keep < 1.0 and mask_mode == "input":
        flat.append(stack2([mv for mv, _ in masks]))
        flat.append(stack2([mh for _, mh in masks]))

    xvo_s, xho_s = fn(meta, *flat)
    xvo = xvo_s.reshape(L, b, h, w_, f)
    xho = xho_s.reshape(L, b, h, w_, f)
    return [(xvo[l], xho[l]) for l in range(L)]
