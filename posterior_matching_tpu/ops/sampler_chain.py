"""Pallas per-row PixelCNN sampler kernel (the eval hot loop).

The incrementally-cached sampler (models/pixelcnn_fast.py) made each pixel
O(1) network work, but its per-pixel horizontal chain is ~2*num_resnet
sequential [n, ~10F] @ [~10F, F] matmuls issued as separate XLA ops inside a
``lax.scan`` — measured ~5% MXU at the eval-protocol shapes (BASELINE.md
roadmap: 0.132 s/batch vs a ~9-26 ms compute/weight-stream floor).  The
recoverable slack is per-op dispatch latency on the sequential critical path,
exactly what a fused kernel removes.

This module runs ONE Pallas kernel per image ROW with grid ``(wid, L)``,
L = 2*num_resnet gated levels, level index fastest:

- the fused per-level weight stacks ([12F, F] for conv_a incl. the aux cue,
  [8F, 2F] for conv_b) are streamed by the level grid index — Mosaic
  prefetches level l+1's weights while level l computes, so the ~levels*2.5MB
  of weights never need to be VMEM-resident at once;
- the chain carry (current pixel's running value), the previous pixel's
  per-level values (the (0,-1) taps), and the per-level gated intermediates
  live in VMEM scratch across the whole row — zero HBM round trips on the
  sequential path;
- the previous ROW's per-level tensors (the (-1,-1)/(-1,0) taps) stream from
  the previous kernel launch's outputs as two block streams (col c-1 and
  col c) with no padding copies (col 0 is zero-masked in kernel);
- sampling happens in-kernel at the last level: ``argmax(logits + gumbel)``
  where the Gumbel noise is PRECOMPUTED outside with the exact per-pixel key
  sequence of the cached sampler.  ``jax.random.categorical(k, logits)`` IS
  ``argmax(logits + jax.random.gumbel(k, logits.shape))``, so given the same
  key the kernel's draws match the cached sampler's wherever the (f32)
  logits agree — a bit-comparable acceptance test instead of an untestable
  in-kernel PRNG (the catch that kept this kernel out of round 4,
  BASELINE.md roadmap); the sampled index feeds the next pixel through the
  embedding table in VMEM.

The vertical-stack row pass (whole-row batched convs, already MXU-shaped)
stays in XLA, computed per row between kernel launches, in the same compute
dtype.

Reference behavior being accelerated: the raster sampling loop of
reference pixel_cnn.py:102-123 (one FULL network forward per pixel there).
Layer structure: reference pixel_cnn.py:451-522.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from posterior_matching_tpu.models.pixelcnn import PixelCNN
from posterior_matching_tpu.models.pixelcnn_fast import _conv_taps, _dense
from posterior_matching_tpu.ops.gated_block import _concat_elu, _elu

f32 = jnp.float32

# Fixed cached-tap order shared by the fused weight stacks and the kernel's
# concat: (-1,-1), (-1,0), (0,-1), then the in-chain (0,0) tap, then aux.
_TAP_ORDER = ((-1, -1), (-1, 0), (0, -1), (0, 0))


def _celu(x):
    return jax.nn.elu(jnp.concatenate([x, -x], axis=-1))


def _fuse_level(bp, f):
    """One horizontal gated level's params -> uniform fused stacks.

    Wa is [12F, F]: 4 taps x concat_elu(F)=2F rows + a 4F aux slot.  Up
    levels (aux = V_i, F wide) scatter their [2F, F] aux kernel into slot
    rows [8F:9F] (elu(p)) and [10F:11F] (elu(-p)) with zeros between, so the
    kernel can uniformly feed ``concat_elu(concat(aux_p, aux_q))`` with
    aux_q = 0 for up levels / the skip tensor for down levels (elu(0) = 0
    hits the zero rows).  Down levels' [4F, F] aux kernels map directly.
    """
    (taps_a, bias_a), (taps_b, bias_b) = bp["a"], bp["b"]
    tapmap_a = {(dy, dx): w for dy, dx, w in taps_a}
    wa_taps = jnp.concatenate([tapmap_a[o] for o in _TAP_ORDER], axis=0)
    aux = bp["aux"]
    ak, ab = aux["kernel"], aux["bias"]
    if ak.shape[0] == 2 * f:      # up level: aux input is concat_elu(F)
        z = jnp.zeros((f, ak.shape[1]), ak.dtype)
        aux_rows = jnp.concatenate([ak[:f], z, ak[f:], z], axis=0)
    elif ak.shape[0] == 4 * f:    # down level: concat_elu(2F)
        aux_rows = ak
    else:
        raise ValueError(f"unexpected aux kernel rows {ak.shape[0]}")
    wa = jnp.concatenate([wa_taps, aux_rows], axis=0)        # [12F, F]
    ba = bias_a + ab
    tapmap_b = {(dy, dx): w for dy, dx, w in taps_b}
    wb = jnp.concatenate([tapmap_b[o] for o in _TAP_ORDER], axis=0)  # [8F,2F]
    return wa, ba, wb, bias_b


def _cshift(x, dx, n_, wid):
    """Column shift on wid-major flat rows [wid*n, c]: out row (c_, j) holds
    ``x[(c_ + dx)*n + j]``, zero outside [0, wid).  pltpu.roll is 32-bit
    only; callers pass f32."""
    if dx == 0:
        return x
    s = (-(dx * n_)) % x.shape[0]
    xs = pltpu.roll(x, s, 0) if s else x
    ci = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0) // n_
    valid = (ci + dx >= 0) & (ci + dx < wid)
    return jnp.where(valid, xs, jnp.zeros_like(xs))


def _shift3(x, n_, wid, cdtype):
    """[roll(-1), x, roll(+1)] concat along features — the three dx taps of
    a vertical conv as ONE wide-K matmul operand."""
    return jnp.concatenate(
        [
            _cshift(x, -1, n_, wid).astype(cdtype),
            x.astype(cdtype),
            _cshift(x, 1, n_, wid).astype(cdtype),
        ],
        axis=-1,
    )


def _vrow_kernel_factory(L, R, n, wid, f, cdtype):
    """Vertical-stack kernel for one image row: grid (L,), one gated
    vertical level per step with its weights streamed; v_init/h_init_up at
    l == 0.  Rows are wid-major flat [wid*n, .] so column shifts are
    sublane rolls (ops/block_chain.py::_shifted technique).  Replaces the
    XLA row_pass, whose ~13 small launch-bound matmuls per level measured
    ~40 ms/batch of the sampler's 85 ms (device trace 2026-08-20)."""
    rows = wid * n

    def kernel(
        e2_ref, e1_ref, pv0_ref, pv_ref, pm_ref, cpv_ref,
        viw, vib, huw, hub, wav, bav, wbv, bbv, waux,
        outv_ref, outm_ref, v0_ref, hup_ref,
        carry, vstack,
    ):
        l = pl.program_id(0)

        @pl.when(l == 0)
        def _init():
            e2 = e2_ref[:].astype(f32)
            e1 = e1_ref[:].astype(f32)
            a0 = jnp.concatenate(
                [_shift3(e2, n, wid, cdtype), _shift3(e1, n, wid, cdtype)],
                axis=-1,
            )
            v0 = jnp.dot(
                a0, viw[:, :], preferred_element_type=f32
            ) + vib[0].astype(f32)
            hup = jnp.dot(
                _shift3(e1, n, wid, cdtype), huw[:, :],
                preferred_element_type=f32,
            ) + hub[0].astype(f32)
            v0_ref[:] = v0.astype(v0_ref.dtype)
            hup_ref[:] = hup.astype(hup_ref.dtype)
            carry[:, :] = v0
            vstack[pl.ds(0, 1)] = v0[None].astype(vstack.dtype)

        in_cur = carry[:, :]
        in_prev = jnp.where(
            l == 0, pv0_ref[:].astype(f32), pv_ref[0].astype(f32)
        )
        a_in = jnp.concatenate(
            [
                _shift3(_concat_elu(in_prev), n, wid, cdtype),
                _shift3(_concat_elu(in_cur), n, wid, cdtype),
            ],
            axis=-1,
        )                                                     # [rows, 12F]
        a = jnp.dot(
            a_in, wav[0], preferred_element_type=f32
        ) + bav[0, 0].astype(f32)
        # aux cue (down levels: skip = this row's V_{2R-1-l}); up levels
        # carry zero aux weights, but the stale vstack read must be masked
        # (0 * NaN would poison the matmul)
        sk_idx = jnp.maximum(2 * R - 1 - l, 0)
        sk_raw = vstack[pl.ds(sk_idx, 1), :, :][0].astype(f32)
        sk = jnp.where(l >= R, sk_raw, 0.0)
        a = a + jnp.dot(
            _concat_elu(sk).astype(cdtype), waux[0],
            preferred_element_type=f32,
        )
        m = _concat_elu(a)                                    # [rows, 2F]
        m_prev = pm_ref[0].astype(f32)
        b_in = jnp.concatenate(
            [
                _shift3(m_prev, n, wid, cdtype),
                _shift3(m, n, wid, cdtype),
            ],
            axis=-1,
        )                                                     # [rows, 12F]
        cp = jax.lax.broadcast_in_dim(
            cpv_ref[0].astype(f32), (wid, n, 2 * f), (1, 2)
        ).reshape(rows, 2 * f)
        b = jnp.dot(
            b_in, wbv[0], preferred_element_type=f32
        ) + bbv[0, 0].astype(f32) + cp
        act = b[:, :f]
        gate = b[:, f:]
        out = in_cur + jax.nn.sigmoid(gate) * act

        outv_ref[0] = out.astype(outv_ref.dtype)
        outm_ref[0] = m.astype(outm_ref.dtype)
        carry[:, :] = out

        @pl.when(l + 1 <= R)
        def _push():
            vstack[pl.ds(l + 1, 1)] = out[None].astype(vstack.dtype)

    return kernel


def _row_kernel_factory(L, R, n, f, num_idx, cdtype, lpg, with_logits):
    """Kernel for grid (wid, L // lpg): pixel index c slow, level-group
    fast.  ``lpg`` gated levels run inside one grid step (the per-grid-step
    overhead at lpg=1 dominated the measured on-chip time: 6144 steps/batch
    at the eval shapes); L = 2*num_resnet is always even."""

    def kernel(
        wa_ref, ba_ref, wb_ref, bb_ref, cp_ref,
        ha_ref, hb_ref, ma_ref, mb_ref, aux_ref,
        hup_ref, h0p_ref, gmb_ref,
        emb_ref, lw_ref, lb_ref, hlw_ref, hlb_ref,
        *tail_refs,
    ):
        it = iter(tail_refs)
        outh_ref, outm_ref, outs_ref = next(it), next(it), next(it)
        outl_ref = next(it) if with_logits else None
        stack, mstack, chain, h0cur = (next(it) for _ in range(4))
        c = pl.program_id(0)
        l = pl.program_id(1)
        at_edge = c == 0

        # ---- T_0 at the start of each pixel's chain -----------------------
        @pl.when(l == 0)
        def _t0():
            h0p = jnp.where(at_edge, 0.0, h0p_ref[0].astype(f32))
            h0c = jnp.where(at_edge, 0.0, h0cur[:, :].astype(f32))
            hl = jnp.dot(
                jnp.concatenate([h0p, h0c], axis=-1).astype(cdtype),
                hlw_ref[:, :],
                preferred_element_type=f32,
            ) + hlb_ref[0].astype(f32)
            chain[:, :] = (hup_ref[0].astype(f32) + hl).astype(chain.dtype)

        xin = chain[:, :].astype(f32)

        for r in range(lpg):
            lvl = l * lpg + r

            # previous pixel's value/intermediate of this level (the
            # (0,-1) taps); read BEFORE overwriting, zero at the row edge
            old_h = jnp.where(
                at_edge, 0.0, stack[pl.ds(lvl, 1), :, :][0].astype(f32)
            )
            old_m = jnp.where(
                at_edge, 0.0, mstack[pl.ds(lvl, 1), :, :][0].astype(f32)
            )
            stack[pl.ds(lvl, 1), :, :] = xin[None].astype(stack.dtype)

            # aux cue: V_l (up) / W_l (down) from the vertical row pass,
            # plus — down levels only — the skip tensor (this pixel's
            # value at level 2R-1-lvl, overwritten earlier this pixel)
            is_down = lvl >= R
            aux_p = aux_ref[r, 0].astype(f32)
            sk_idx = jnp.where(is_down, 2 * R - 1 - lvl, 0)
            sk = stack[pl.ds(sk_idx, 1), :, :][0].astype(f32)
            aux_q = jnp.where(is_down, sk, 0.0)

            tap_aa = jnp.where(at_edge, 0.0, ha_ref[r, 0].astype(f32))
            tap_ab = hb_ref[r, 0].astype(f32)

            # _elu/_concat_elu from gated_block: Mosaic lacks expm1
            a_in = jnp.concatenate(
                [
                    _concat_elu(tap_aa), _concat_elu(tap_ab),
                    _concat_elu(old_h), _concat_elu(xin),
                    _elu(aux_p), _elu(aux_q), _elu(-aux_p), _elu(-aux_q),
                ],
                axis=-1,
            )                                                 # [n, 12F]
            a = jnp.dot(
                a_in.astype(cdtype), wa_ref[r], preferred_element_type=f32
            ) + ba_ref[r, 0].astype(f32)
            m = _concat_elu(a)                                # [n, 2F]

            tap_ba = jnp.where(at_edge, 0.0, ma_ref[r, 0].astype(f32))
            tap_bb = mb_ref[r, 0].astype(f32)
            b_in = jnp.concatenate(
                [tap_ba, tap_bb, old_m, m], axis=-1
            )                                                 # [n, 8F]
            b = jnp.dot(
                b_in.astype(cdtype), wb_ref[r], preferred_element_type=f32
            ) + bb_ref[r, 0].astype(f32) + cp_ref[r].astype(f32)
            act = b[:, :f]
            gate = b[:, f:]
            out = xin + jax.nn.sigmoid(gate) * act

            mstack[pl.ds(lvl, 1), :, :] = m[None].astype(mstack.dtype)
            outh_ref[r, 0] = xin.astype(outh_ref.dtype)
            outm_ref[r, 0] = m.astype(outm_ref.dtype)
            xin = out

        chain[:, :] = xin.astype(chain.dtype)

        # ---- logits + in-kernel Gumbel-argmax sample at the last level ----
        @pl.when(l == L // lpg - 1)
        def _sample():
            logits = jnp.dot(
                _elu(xin).astype(cdtype), lw_ref[:, :],
                preferred_element_type=f32,
            ) + lb_ref[0].astype(f32)
            y = jnp.argmax(
                logits + gmb_ref[0].astype(f32), axis=-1
            ).astype(jnp.int32)
            outs_ref[0, 0] = y
            if with_logits:
                outl_ref[0] = logits
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (n, num_idx), 1)
                == y[:, None]
            )
            h0cur[:, :] = jnp.dot(
                onehot.astype(cdtype), emb_ref[:, :],
                preferred_element_type=f32,
            ).astype(h0cur.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "pixel_cnn", "num_samples", "compute_dtype", "interpret",
        "return_logits",
    ),
)
def pixelcnn_sample_rowkernel(
    pixel_cnn: PixelCNN,
    params,
    key: jax.Array,
    num_samples: int,
    conditional_input: Optional[jnp.ndarray] = None,
    *,
    compute_dtype: str = "float32",
    interpret: bool = False,
    noise: Optional[jnp.ndarray] = None,
    return_logits: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ``pixelcnn_sample_fast`` backed by the per-row
    Pallas kernel.  Same key discipline, same noise sequence; samples match
    the cached sampler bit-for-bit wherever the logits agree to float
    rounding (exact in f32; see tests/test_sampler_chain.py).

    Returns [num_samples, B, H, W] int32 (or [num_samples, H, W] when
    unconditional).
    """
    if pixel_cnn.num_hierarchies != 1:
        raise ValueError("row-kernel sampler supports num_hierarchies == 1")
    if tuple(pixel_cnn.receptive_field_dims) != (3, 3):
        raise ValueError(
            "row-kernel sampler supports receptive_field_dims == (3, 3)"
        )
    cdtype = jnp.dtype(compute_dtype)

    fdim = pixel_cnn.num_filters
    hgt, wid = pixel_cnn.image_shape
    n_res = pixel_cnn.num_resnet
    L = 2 * n_res
    KV = 2 * n_res + 1

    if conditional_input is not None:
        bsz = conditional_input.shape[0]
        cond = jnp.broadcast_to(
            conditional_input[None], (num_samples, *conditional_input.shape)
        ).reshape((num_samples * bsz, -1)).astype(f32)
        n = num_samples * bsz
    else:
        bsz = None
        cond = None
        n = num_samples

    # ---- parameter extraction (same structure as pixelcnn_fast) ----------
    embed = jnp.asarray(params["embed"]["embedding"], f32)
    num_idx = embed.shape[0]

    vinit = _conv_taps(params["v_init"], (0, 2), (0, 3))
    hup = _conv_taps(params["h_init_up"], (0, 1), (0, 3))
    hleft = _conv_taps(params["h_init_left"], (0, 2), (0, 1))

    def block_params(tag):
        # valid tap regions: vertical (0,2)x(0,3) — look-right dx=+1 is
        # causal for the vertical stack; horizontal (0,2)x(0,2)
        cols = (0, 3) if "vertical" in tag else (0, 2)
        return {
            "a": _conv_taps(params[f"{tag}_conv_a"], (0, 2), cols),
            "b": _conv_taps(params[f"{tag}_conv_b"], (0, 2), cols),
            "aux": params.get(f"{tag}_aux"),
            "cond": params.get(f"{tag}_cond_proj"),
        }

    up_v = [block_params(f"up_0_{r}_vertical") for r in range(n_res)]
    up_h = [block_params(f"up_0_{r}_horizontal") for r in range(n_res)]
    dn_v = [block_params(f"dn_0_{r}_vertical") for r in range(n_res)]
    dn_h = [block_params(f"dn_0_{r}_horizontal") for r in range(n_res)]

    fused = [_fuse_level(b, fdim) for b in up_h + dn_h]
    wa_s = jnp.stack([x[0] for x in fused]).astype(cdtype)   # [L, 12F, F]
    # biases ride as [L, 1, cols] so the streamed block's trailing dims
    # (1, cols) equal the array's (Mosaic tiling legality on real TPU)
    ba_s = jnp.stack([x[1] for x in fused]).astype(f32)[:, None]  # [L,1,F]
    wb_s = jnp.stack([x[2] for x in fused]).astype(cdtype)   # [L, 8F, 2F]
    bb_s = jnp.stack([x[3] for x in fused]).astype(f32)[:, None]  # [L,1,2F]

    def cond_proj(bp):
        if cond is None or bp["cond"] is None:
            return jnp.zeros((n, 2 * fdim), f32)
        return _dense(bp["cond"], cond)

    cp_h = jnp.stack([cond_proj(b) for b in up_h + dn_h])    # [L, n, 2F]
    cp_upv = [cond_proj(b) for b in up_v]
    cp_dnv = [cond_proj(b) for b in dn_v]

    hlw = jnp.concatenate([w for _, _, w in hleft[0]], axis=0).astype(cdtype)
    hlb = hleft[1].reshape(1, -1).astype(f32)
    logits_w = jnp.asarray(
        params["logits_conv"]["kernel"][0, 0], cdtype
    )                                                        # [F, NI]
    logits_b = jnp.asarray(
        params["logits_conv"]["bias"], f32
    ).reshape(1, -1)
    emb_cd = embed.astype(cdtype)

    # vertical row-pass weights, cast once
    def cast_taps(tb):
        taps, bias = tb
        return [(dy, dx, w.astype(cdtype)) for dy, dx, w in taps], bias

    vinit = cast_taps(vinit)
    hup = cast_taps(hup)
    for bp in up_v + dn_v:
        bp["a"] = cast_taps(bp["a"])
        bp["b"] = cast_taps(bp["b"])

    # ---- vertical row pass in [wid, n, F] layout --------------------------
    def shift0(x, dx):
        """out[c] = x[c + dx] along axis 0 (zero padded)."""
        if dx == 0:
            return x
        w = x.shape[0]
        if dx < 0:
            return jnp.pad(x, ((-dx, 0), (0, 0), (0, 0)))[:w]
        return jnp.pad(x, ((0, dx), (0, 0), (0, 0)))[dx:]

    def row_conv(taps_bias, rows):
        taps, bias = taps_bias
        acc = None
        for dy, dx, w in taps:
            term = jnp.dot(
                shift0(rows[dy], dx).astype(cdtype), w,
                preferred_element_type=f32,
            )
            acc = term if acc is None else acc + term
        return acc + bias

    def gated_row(bp, cproj, in_prev, in_cur, m_prev, aux_row):
        a = row_conv(
            bp["a"], {-1: _celu(in_prev), 0: _celu(in_cur)}
        )
        if aux_row is not None:
            a = a + _dense(
                jax.tree.map(lambda v: v.astype(cdtype), bp["aux"]),
                _celu(aux_row).astype(cdtype),
            )
        m = _celu(a)
        b = row_conv(bp["b"], {-1: m_prev, 0: m}) + cproj[None]
        act, gate = jnp.split(b, 2, axis=-1)
        return in_cur + jax.nn.sigmoid(gate) * act, m

    def row_pass(e2, e1, vprev, vmprev):
        v_rows = [row_conv(vinit, {-2: e2, -1: e1})]
        m_rows = []
        for i in range(n_res):
            out, m = gated_row(
                up_v[i], cp_upv[i], vprev[i], v_rows[i], vmprev[i], None
            )
            v_rows.append(out)
            m_rows.append(m)
        w_rows = [v_rows[n_res]]
        for i in range(n_res):
            out, m = gated_row(
                dn_v[i], cp_dnv[i], vprev[n_res + i], w_rows[i],
                vmprev[n_res + i], v_rows[n_res - 1 - i],
            )
            w_rows.append(out)
            m_rows.append(m)
        hup_row = row_conv(hup, {-1: e1})
        new_vprev = jnp.stack(v_rows + w_rows[1:])
        new_vmprev = jnp.stack(m_rows)
        aux_rows = jnp.stack(v_rows[1:] + w_rows[1:], axis=0)  # [L,wid,n,F]
        return aux_rows, hup_row, new_vprev, new_vmprev

    # ---- vertical-stack kernel (replaces row_pass; PM_TPU_SAMPLER_VKERNEL=0
    # falls back to the XLA row pass) ---------------------------------------
    vkernel = os.environ.get("PM_TPU_SAMPLER_VKERNEL", "1") != "0"
    # bulk Gumbel bits from the hardware rbg generator on TPU
    # (threefry bulk-bit generation is pure VPU ALU work — the measured
    # dropout finding, BASELINE.md); per-pixel threefry retained off-TPU
    # so the same-noise parity tests stay exact
    use_rbg = (
        jax.default_backend() == "tpu"
        and os.environ.get("PM_TPU_SAMPLER_RNG", "rbg") == "rbg"
    )
    rows_flat = wid * n

    def _vtap_stack(taps_bias, order):
        taps, bias = taps_bias
        tapmap = {(dy, dx): w for dy, dx, w in taps}
        wst = jnp.concatenate([tapmap[o] for o in order], axis=0)
        return wst, jnp.reshape(bias, (1, -1))

    _VI_ORDER = [(-2, -1), (-2, 0), (-2, 1), (-1, -1), (-1, 0), (-1, 1)]
    _VG_ORDER = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1)]
    _HU_ORDER = [(-1, -1), (-1, 0), (-1, 1)]

    if vkernel:
        viw, vib = _vtap_stack(vinit, _VI_ORDER)
        huw, hub = _vtap_stack(hup, _HU_ORDER)
        wav_l, bav_l, wbv_l, bbv_l, waux_l = [], [], [], [], []
        for idx_l, bp in enumerate(up_v + dn_v):
            wa_, ba_ = _vtap_stack(bp["a"], _VG_ORDER)
            wb_, bb_ = _vtap_stack(bp["b"], _VG_ORDER)
            if bp["aux"] is not None and idx_l >= n_res:
                waux_l.append(bp["aux"]["kernel"].astype(cdtype))
                ba_ = ba_ + bp["aux"]["bias"].reshape(1, -1)
            else:
                waux_l.append(jnp.zeros((2 * fdim, fdim), cdtype))
            wav_l.append(wa_)
            bav_l.append(ba_)
            wbv_l.append(wb_)
            bbv_l.append(bb_)
        wav_s = jnp.stack(wav_l)                          # [L, 12F, F]
        bav_s = jnp.stack(bav_l).astype(f32)              # [L, 1, F]
        wbv_s = jnp.stack(wbv_l)                          # [L, 12F, 2F]
        bbv_s = jnp.stack(bbv_l).astype(f32)              # [L, 1, 2F]
        waux_s = jnp.stack(waux_l)                        # [L, 2F, F]
        cpv_s = jnp.stack(cp_upv + cp_dnv).astype(cdtype)  # [L, n, 2F]

        vkern = _vrow_kernel_factory(L, n_res, n, wid, fdim, cdtype)

        def vfull(shape):
            nd = len(shape)
            return pl.BlockSpec(shape, lambda l, _n=nd: (0,) * _n)

        vrow_call = pl.pallas_call(
            vkern,
            grid=(L,),
            in_specs=[
                vfull((rows_flat, fdim)),                 # e2
                vfull((rows_flat, fdim)),                 # e1
                vfull((rows_flat, fdim)),                 # prev v0
                pl.BlockSpec(
                    (1, rows_flat, fdim),
                    lambda l: (jnp.maximum(l - 1, 0), 0, 0),
                ),                                        # prev outv
                pl.BlockSpec(
                    (1, rows_flat, 2 * fdim), lambda l: (l, 0, 0)
                ),                                        # prev outm
                pl.BlockSpec((1, n, 2 * fdim), lambda l: (l, 0, 0)),  # cpv
                vfull((6 * fdim, fdim)),                  # viw
                vfull((1, fdim)),                         # vib
                vfull((3 * fdim, fdim)),                  # huw
                vfull((1, fdim)),                         # hub
                pl.BlockSpec(
                    (1, 12 * fdim, fdim), lambda l: (l, 0, 0)
                ),                                        # wav
                pl.BlockSpec((1, 1, fdim), lambda l: (l, 0, 0)),      # bav
                pl.BlockSpec(
                    (1, 12 * fdim, 2 * fdim), lambda l: (l, 0, 0)
                ),                                        # wbv
                pl.BlockSpec((1, 1, 2 * fdim), lambda l: (l, 0, 0)),  # bbv
                pl.BlockSpec(
                    (1, 2 * fdim, fdim), lambda l: (l, 0, 0)
                ),                                        # waux
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, rows_flat, fdim), lambda l: (l, 0, 0)
                ),                                        # outv
                pl.BlockSpec(
                    (1, rows_flat, 2 * fdim), lambda l: (l, 0, 0)
                ),                                        # outm
                vfull((rows_flat, fdim)),                 # v0
                vfull((rows_flat, fdim)),                 # hup
            ],
            out_shape=[
                jax.ShapeDtypeStruct((L, rows_flat, fdim), cdtype),
                jax.ShapeDtypeStruct((L, rows_flat, 2 * fdim), cdtype),
                jax.ShapeDtypeStruct((rows_flat, fdim), cdtype),
                jax.ShapeDtypeStruct((rows_flat, fdim), cdtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((rows_flat, fdim), f32),            # carry
                pltpu.VMEM((n_res + 1, rows_flat, fdim), cdtype),  # vstack
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
        )

    # ---- per-row kernel ---------------------------------------------------
    # levels per grid step: amortizes Mosaic's per-grid-step overhead
    # (measured on-chip dominant at lpg=1); L = 2*n_res is always even
    lpg = int(os.environ.get("PM_TPU_SAMPLER_LPG", "4"))
    while L % lpg:
        lpg -= 1
    kernel = _row_kernel_factory(
        L, n_res, n, fdim, num_idx, cdtype, lpg, return_logits
    )

    def lvl_spec(rows, cols):
        return pl.BlockSpec((lpg, rows, cols), lambda c, l: (l, 0, 0))

    def lvl_vec_spec(cols):
        return pl.BlockSpec((lpg, 1, cols), lambda c, l: (l, 0, 0))

    def colm1_lvl_spec(cols):
        # level-leading [L, wid, n, cols] arrays: the vertical kernel's
        # outputs feed these streams with zero transposes
        return pl.BlockSpec(
            (lpg, 1, n, cols),
            lambda c, l: (l, jnp.maximum(c - 1, 0), 0, 0),
        )

    def col_lvl_spec(cols):
        return pl.BlockSpec((lpg, 1, n, cols), lambda c, l: (l, c, 0, 0))

    def col_spec(cols, minus1=False):
        if minus1:
            return pl.BlockSpec(
                (1, n, cols), lambda c, l: (jnp.maximum(c - 1, 0), 0, 0)
            )
        return pl.BlockSpec((1, n, cols), lambda c, l: (c, 0, 0))

    def full_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda c, l: (0,) * nd)

    in_specs = [
        lvl_spec(12 * fdim, fdim),          # wa
        lvl_vec_spec(fdim),                 # ba
        lvl_spec(8 * fdim, 2 * fdim),       # wb
        lvl_vec_spec(2 * fdim),             # bb
        lvl_spec(n, 2 * fdim),              # cproj
        colm1_lvl_spec(fdim),               # ha (prev row, col c-1)
        col_lvl_spec(fdim),                 # hb (prev row, col c)
        colm1_lvl_spec(2 * fdim),           # ma
        col_lvl_spec(2 * fdim),             # mb
        col_lvl_spec(fdim),                 # aux
        col_spec(fdim),                     # hup
        col_spec(fdim, minus1=True),        # h0prev (col c-1)
        col_spec(num_idx),                  # gumbel
        full_spec((num_idx, fdim)),         # embed
        full_spec((fdim, num_idx)),         # logits_w
        full_spec((1, num_idx)),            # logits_b
        full_spec((2 * fdim, fdim)),        # hleft_w
        full_spec((1, fdim)),               # hleft_b
    ]
    out_specs = [
        col_lvl_spec(fdim),                                     # out_h
        col_lvl_spec(2 * fdim),                                 # out_m
        pl.BlockSpec((1, 1, n), lambda c, l: (c, 0, 0)),        # out_s
    ]
    out_shape = [
        jax.ShapeDtypeStruct((L, wid, n, fdim), cdtype),
        jax.ShapeDtypeStruct((L, wid, n, 2 * fdim), cdtype),
        jax.ShapeDtypeStruct((wid, 1, n), jnp.int32),
    ]
    if return_logits:
        out_specs.append(col_spec(num_idx))                     # out_logits
        out_shape.append(
            jax.ShapeDtypeStruct((wid, n, num_idx), f32)
        )
    scratch = [
        pltpu.VMEM((L, n, fdim), cdtype),        # stack
        pltpu.VMEM((L, n, 2 * fdim), cdtype),    # mstack
        pltpu.VMEM((n, fdim), cdtype),           # chain
        pltpu.VMEM((n, fdim), cdtype),           # h0cur
    ]
    row_call = pl.pallas_call(
        kernel,
        grid=(wid, L // lpg),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )

    def row_body(carry, row_noise):
        e2, e1, vstate, prevh, prevm, key = carry
        if vkernel:
            pv0, pv, pmv = vstate
            outv, outm_v, v0, hup_flat = vrow_call(
                e2.reshape(rows_flat, fdim), e1.reshape(rows_flat, fdim),
                pv0, pv, pmv, cpv_s,
                viw.astype(cdtype), vib.astype(f32),
                huw.astype(cdtype), hub.astype(f32),
                wav_s.astype(cdtype), bav_s, wbv_s.astype(cdtype), bbv_s,
                waux_s,
            )
            vstate = (v0, outv, outm_v)
            aux_rows = outv.reshape(L, wid, n, fdim)
            hup_row = hup_flat.reshape(wid, n, fdim)
        else:
            vprev, vmprev = vstate
            aux_rows, hup_row, vprev, vmprev = row_pass(
                e2, e1, vprev, vmprev
            )
            vstate = (vprev, vmprev)
            aux_rows = aux_rows.astype(cdtype)
            hup_row = hup_row.astype(cdtype)

        if row_noise is None:
            if use_rbg:
                from posterior_matching_tpu.utils import fast_bits_key

                key, sub = jax.random.split(key)
                gmb = jax.random.gumbel(
                    fast_bits_key(sub), (wid, n, num_idx), f32
                )
            else:
                def kbody(k, _):
                    k, sub = jax.random.split(k)
                    return k, sub

                key, subs = jax.lax.scan(kbody, key, None, length=wid)
                gmb = jax.vmap(
                    lambda kk: jax.random.gumbel(kk, (n, num_idx), f32)
                )(subs)
        else:
            gmb = row_noise

        outs = row_call(
            wa_s, ba_s, wb_s, bb_s, cp_h.astype(cdtype),
            prevh, prevh, prevm, prevm, aux_rows,
            hup_row, e1, gmb,
            emb_cd, logits_w, logits_b, hlw, hlb,
        )
        outh, outm, s_row = outs[:3]
        s_row = s_row[:, 0]                                  # [wid, n]
        e_row = jnp.take(emb_cd, s_row, axis=0)              # [wid, n, F]
        ys = (s_row, outs[3]) if return_logits else s_row
        return (e1, e_row, vstate, outh, outm, key), ys

    if vkernel:
        vstate0 = (
            jnp.zeros((rows_flat, fdim), cdtype),            # prev v0
            jnp.zeros((L, rows_flat, fdim), cdtype),         # prev outv
            jnp.zeros((L, rows_flat, 2 * fdim), cdtype),     # prev outm
        )
    else:
        vstate0 = (
            jnp.zeros((KV, wid, n, fdim), f32),              # vprev
            jnp.zeros((L, wid, n, 2 * fdim), f32),           # vmprev
        )
    init = (
        jnp.zeros((wid, n, fdim), cdtype),                   # e_{-2}
        jnp.zeros((wid, n, fdim), cdtype),                   # e_{-1}
        vstate0,
        jnp.zeros((L, wid, n, fdim), cdtype),                # prevh
        jnp.zeros((L, wid, n, 2 * fdim), cdtype),            # prevm
        key,
    )
    _, ys = jax.lax.scan(row_body, init, noise, length=hgt)
    samples, logits = ys if return_logits else (ys, None)
    samples = jnp.transpose(samples, (2, 0, 1))              # [n, H, W]
    if bsz is not None:
        samples = samples.reshape((num_samples, bsz, hgt, wid))
    if return_logits:
        return samples, jnp.transpose(logits, (2, 0, 1, 3))  # [n, H, W, NI]
    return samples
