"""Pallas streamed chain kernels for VDVAE bottleneck-block RUNS.

The PM-VDVAE step is bound by its ~145 tiny sequential convs (reference
vdvae.py:242-284, 815-824): at MNIST shapes every conv is a [*, 192]x[192,48]
-class matmul that XLA launches as its own fusion with an HBM round trip in
between — per-kernel launch/ramp overhead on a sub-10us compute body, the
same fragmentation the PixelCNN chain kernels removed (BASELINE.md round-3
trace).  This module fuses a RUN of consecutive bottleneck blocks at one
resolution — ``x -> Block_L(...Block_1(x))`` with ``Block = gelu -> 1x1 ->
gelu -> kxk -> gelu -> kxk -> gelu -> 1x1 (+ residual)`` (reference
vdvae.py:242-284; our ``models/vdvae.py::Block``) — into ONE forward and ONE
backward kernel, following the measured-winning streamed design of
``ops/gated_chain.py::gated_stream`` (round-3 A/B: stream > pairs > resident
segments):

- grid ``(chunk, level)`` with the LEVEL axis fastest (the transpose of
  gated_stream's layout): each batch chunk runs through all L levels before
  the next chunk starts, so the inter-level x carry lives in a CHUNK-sized
  VMEM scratch — independent of the batch size.  (The flagship chain keeps
  chunk-fastest because its carry is small and its weights large; here the
  VDVAE carry at [batch*28*28, 192] f32 blew the 16 MB scoped-VMEM limit
  while the per-level weights are ~0.2 MB, so re-streaming weights once per
  chunk is the cheap side of the trade.)  The only HBM activation traffic
  is the per-level saves the backward needs (block input x_l and the three
  pre-gelu intermediates h1/h2/h3);
- the weight gradients accumulate in f32 output blocks whose index map is
  CONSTANT — each dW output's block is the whole ``[L, rows, cols]`` stack
  (~0.2 MB/level, <2 MB at the deepest run), so Mosaic keeps it resident in
  VMEM for the entire launch (the documented unchanged-block rule; nothing
  relies on revisit-refetch semantics) and flushes it once at the end; the
  kernel indexes the active level dynamically;
- the kxk convs run as k*k shifted-tap MXU matmuls over the full (padded)
  spatial extent held in VMEM — no halo exchange, the whole [bc, H, W, C]
  chunk is resident (H <= 28 at the VDVAE shapes);
- the forward saves each level's OUTPUT ``xout`` (plus the three pre-gelu
  intermediates); level ``l``'s input is reconstructed in the backward as
  ``xout[l-1]`` (``x0`` for level 0) — saving inputs as well would duplicate
  the residual stream in both VMEM block buffers and HBM traffic (it OOM'd
  the 16 MB scoped limit at the MNIST res-28 run), and the chain's final
  output is simply the last level's slice of the same stack;
- gelu is the tanh approximation ``jax.nn.gelu(approximate=True)`` used by
  the flax blocks, evaluated in f32 (Mosaic bf16 transcendental rules, see
  ops/gated_block.py::_elu) and recomputed in the backward from the saved
  pre-activations.

Granularity lesson (ops/gated_block.py header): a single fused BLOCK kernel
measured a 1.06x isolated win but LOST end-to-end (pallas_call boundaries at
block granularity defeat XLA's cross-op fusion); only multi-level CHAIN
launches pay.  Callers should therefore fuse runs with L >= 2 and leave
isolated blocks (the VDVAE decoder's per-block heads) to XLA.

Residual chains only: every level has ``residual=True`` and
``out_width == in_width`` — exactly the VDVAE encoder's per-resolution runs
(reference vdvae.py:287-328; downsampling stays outside, applied to the
chain output).  No dropout, no conditioning, no masks — the VDVAE blocks
have none.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from posterior_matching_tpu.ops.gated_block import _dot, _dot_t

f32 = jnp.float32

_GELU_C = float(np.sqrt(2.0 / np.pi))
_GELU_A = 0.044715


def _gelu(z):
    """tanh-approximate gelu in f32 — matches ``jax.nn.gelu`` (approximate,
    the flax Block's activation) bit-for-bit at f32 inputs."""
    zf = z.astype(f32)
    t = jnp.tanh(_GELU_C * (zf + _GELU_A * zf * zf * zf))
    return 0.5 * zf * (1.0 + t)


def _gelu_grad(z, g):
    """(d gelu / dz)(z) * g, f32."""
    zf = z.astype(f32)
    u = _GELU_C * (zf + _GELU_A * zf * zf * zf)
    t = jnp.tanh(u)
    du = _GELU_C * (1.0 + 3.0 * _GELU_A * zf * zf)
    return g.astype(f32) * (0.5 * (1.0 + t) + 0.5 * zf * (1.0 - t * t) * du)


class BlockChainConfig(NamedTuple):
    """Static geometry of one block-chain launch (hashable: lru_cache key)."""

    h: int
    w: int
    cin: int       # chain width (residual: in == out)
    mid: int       # bottleneck width (middle_width)
    k: int         # conv kernel size of c2/c3 (3 at res > 2, else 1)
    cdtype: str = "float32"
    bc_fwd: int = 1
    bc_bwd: int = 1
    interpret: bool = False


def weight_shapes(cfg: BlockChainConfig):
    """Kernel-native per-level weight shapes, in argument order. The kxk
    kernels are flattened tap-major: row block ``t*mid:(t+1)*mid`` is conv
    kernel tap ``(t // k, t % k)`` — i.e. ``kernel.reshape(k*k*mid, mid)``."""
    kk = cfg.k * cfg.k
    return [
        ("w1", (cfg.cin, cfg.mid)),
        ("b1", (1, cfg.mid)),
        ("w2", (kk * cfg.mid, cfg.mid)),
        ("b2", (1, cfg.mid)),
        ("w3", (kk * cfg.mid, cfg.mid)),
        ("b3", (1, cfg.mid)),
        ("w4", (cfg.mid, cfg.cin)),
        ("b4", (1, cfg.cin)),
    ]


class _Lvl:
    """Rank-2 view of one level's ``[1, rows, cols]`` block (gated_chain)."""

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


class _StackLvl:
    """Rank-2 view of one (dynamically indexed) level of a RESIDENT
    ``[L, rows, cols]`` stack — the dW accumulators, whose output block is
    the whole stack (constant index map) so it stays in VMEM across the
    entire (chunk, level) sweep."""

    __slots__ = ("ref", "lvl")

    def __init__(self, ref, lvl):
        self.ref = ref
        self.lvl = lvl

    def _idx(self, idx):
        return (self.lvl, *(idx if isinstance(idx, tuple) else (idx,)))

    def __getitem__(self, idx):
        return self.ref[self._idx(idx)]

    def __setitem__(self, idx, value):
        self.ref[self._idx(idx)] = value

    @property
    def dtype(self):
        return self.ref.dtype


def _row_coords(rows, cfg):
    """(r, c) image coordinates of each flat row, [rows, 1] i32 columns.
    Row layout is (image, r, c) flattened — image-major."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    return (ri // cfg.w) % cfg.h, ri % cfg.w


def _shifted(x, dy, dx, r, c, cfg):
    """Flat-rows spatial shift: output row (b, r, c) holds
    ``x[b, r+dy, c+dx]``, zero outside the image.

    Mosaic cannot shape-cast the flat ``[bc*h*w, m]`` activations to 4-D at
    these (h, w) (infer-vector-layout rejects the cast for non-tile-aligned
    minor dims), so the kxk conv taps are built WITHOUT any reshape/pad: a
    sublane rotate (``pltpu.roll``; flat offset ``dy*w + dx``) plus an
    iota-derived boundary mask.  Rows that wrap around the array (or cross
    an image boundary) always fall outside the mask, because the flat-index
    arithmetic carries exactly when ``c+dx`` leaves [0, w)."""
    s = (-(dy * cfg.w + dx)) % x.shape[0]   # roll requires shift >= 0
    if s and x.dtype.itemsize < 4:
        # Mosaic's rotate is 32-bit only; the f32 round trip is exact
        sh = pltpu.roll(x.astype(f32), s, 0).astype(x.dtype)
    elif s:
        sh = pltpu.roll(x, s, 0)
    else:
        sh = x
    rv = r + dy
    cv = c + dx
    valid = (rv >= 0) & (rv < cfg.h) & (cv >= 0) & (cv < cfg.w)
    return jnp.where(valid, sh, jnp.zeros_like(sh))


def _conv_taps_fwd(g2, w_ref, cfg, rc, cdtype):
    """kxk SAME conv as k*k shifted-tap matmuls.

    ``g2`` is [bc*h*w, mid]; ``w_ref`` a ``_Lvl`` view of [k*k*mid, mid];
    ``rc`` the cached :func:`_row_coords`.  Returns the f32 accumulator
    [bc*h*w, mid]."""
    m, k = cfg.mid, cfg.k
    if k == 1:
        return _dot(g2, w_ref[:].astype(cdtype))
    p = k // 2
    r, c = rc
    acc = None
    for dr in range(k):
        for dc in range(k):
            t = dr * k + dc
            x2 = _shifted(g2, dr - p, dc - p, r, c, cfg)
            part = _dot(x2, w_ref[pl.ds(t * m, m), :].astype(cdtype))
            acc = part if acc is None else acc + part
    return acc


def _conv_taps_bwd_input(dh, w_ref, cfg, rc, cdtype):
    """Input cotangent of the kxk SAME conv: mirrored-tap matmuls with
    ``w[t]^T`` (output cotangent shifted by the NEGATED tap offset)."""
    m, k = cfg.mid, cfg.k
    if k == 1:
        return jax.lax.dot_general(
            dh.astype(cdtype), w_ref[:].astype(cdtype),
            (((1,), (1,)), ((), ())), preferred_element_type=f32,
        )
    p = k // 2
    r, c = rc
    acc = None
    for dr in range(k):
        for dc in range(k):
            t = dr * k + dc
            x2 = _shifted(
                dh.astype(cdtype), -(dr - p), -(dc - p), r, c, cfg
            )
            # dh @ w[t]^T: contract on the OUT axis of w[t]
            part = jax.lax.dot_general(
                x2, w_ref[pl.ds(t * m, m), :].astype(cdtype),
                (((1,), (1,)), ((), ())), preferred_element_type=f32,
            )
            acc = part if acc is None else acc + part
    return acc


def _conv_taps_bwd_weights(g2, dh, dw_ref, cfg, rc, cdtype):
    """Accumulates the kxk conv's weight gradient into the resident f32
    ``dw_ref`` ([k*k*mid, mid]): ``dW[t] += shifted(g2, t)^T @ dh``."""
    m, k = cfg.mid, cfg.k
    dhc = dh.astype(cdtype)
    if k == 1:
        dw_ref[:, :] += _dot_t(g2, dhc)
        return
    p = k // 2
    r, c = rc
    for dr in range(k):
        for dc in range(k):
            t = dr * k + dc
            x2 = _shifted(g2, dr - p, dc - p, r, c, cfg)
            dw_ref[pl.ds(t * m, m), :] += _dot_t(x2, dhc)


def _fwd_kernel_factory(cfg: BlockChainConfig, L: int):
    bc = cfg.bc_fwd
    bchw = bc * cfg.h * cfg.w
    cdtype = jnp.dtype(cfg.cdtype)

    def kernel(x0_ref, w1, b1, w2, b2, w3, b3, w4, b4,
               xout_ref, h1_ref, h2_ref, h3_ref, x_scr):
        w1, b1, w2, b2, w3, b3, w4, b4 = map(
            _Lvl, (w1, b1, w2, b2, w3, b3, w4, b4)
        )
        l = pl.program_id(1)          # level axis is FASTEST (see module doc)

        # The residual stream stays f32 even at bf16 compute — the flax
        # Block's c4 runs at dtype=None so its f32 params promote the block
        # output back to f32 (models/vdvae.py:116-119); c1-c3 and the taps
        # run at compute dtype.
        x = jnp.where(l == 0, x0_ref[:], x_scr[:])
        rc = _row_coords(bchw, cfg)

        g0 = _gelu(x).astype(cdtype)
        h1 = _dot(g0, w1[:].astype(cdtype)) + b1[:].astype(f32)
        g1 = _gelu(h1).astype(cdtype)
        h2 = _conv_taps_fwd(g1, w2, cfg, rc, cdtype) + b2[:].astype(f32)
        g2 = _gelu(h2).astype(cdtype)
        h3 = _conv_taps_fwd(g2, w3, cfg, rc, cdtype) + b3[:].astype(f32)
        g3 = _gelu(h3)                                  # f32 (c4 is f32)
        h4 = _dot(g3, w4[:].astype(f32)) + b4[:].astype(f32)
        out = x + h4

        h1_ref[:] = h1.astype(h1_ref.dtype)
        h2_ref[:] = h2.astype(h2_ref.dtype)
        h3_ref[:] = h3.astype(h3_ref.dtype)
        xout_ref[:] = out
        x_scr[:] = out

    return kernel


def _bwd_kernel_factory(cfg: BlockChainConfig, L: int):
    bc = cfg.bc_bwd
    bchw = bc * cfg.h * cfg.w
    cdtype = jnp.dtype(cfg.cdtype)

    def kernel(g_ref, x0_ref, xprev_ref, h1_ref, h2_ref, h3_ref,
               w1, w2, w3, w4,
               dx0_ref, dw1, db1, dw2, db2, dw3, db3, dw4, db4, d_scr):
        w1, w2, w3, w4 = map(_Lvl, (w1, w2, w3, w4))
        i = pl.program_id(0)
        j = pl.program_id(1)          # reversed: actual level = L - 1 - j
        lvl = L - 1 - j               # row of the resident dW stacks
        dws = dict(
            dw1=_StackLvl(dw1, lvl), db1=_StackLvl(db1, lvl),
            dw2=_StackLvl(dw2, lvl), db2=_StackLvl(db2, lvl),
            dw3=_StackLvl(dw3, lvl), db3=_StackLvl(db3, lvl),
            dw4=_StackLvl(dw4, lvl), db4=_StackLvl(db4, lvl),
        )

        @pl.when((i == 0) & (j == 0))
        def _init():
            # the dW stacks are resident for the whole launch (constant
            # output index map) — zero them once, at the first iteration
            for ref in (dw1, db1, dw2, db2, dw3, db3, dw4, db4):
                ref[:] = jnp.zeros(ref.shape, ref.dtype)

        # Only the chain's FINAL output has an external cotangent (the
        # encoder records just the last activation per resolution run);
        # inner levels read the carried cotangent from scratch.
        dout = jnp.where(j == 0, g_ref[:].astype(f32), d_scr[:])

        # level input, reconstructed from the forward's xout saves: the
        # xprev spec streams xout[lvl-1] (clamped at lvl 0, where x0 wins)
        x = jnp.where(lvl == 0, x0_ref[:], xprev_ref[:])
        h1 = h1_ref[:]
        h2 = h2_ref[:]
        h3 = h3_ref[:]
        g1 = _gelu(h1).astype(cdtype)
        g2 = _gelu(h2).astype(cdtype)
        g3 = _gelu(h3)                                  # f32 (c4 is f32)

        # c4 (1x1, f32 — see the forward): out = x + g3 @ w4 + b4
        dh4 = dout
        dws["dw4"][:, :] += _dot_t(g3, dh4)
        dws["db4"][:, :] += jnp.sum(dh4, axis=0, keepdims=True)
        dg3 = jax.lax.dot_general(
            dh4, w4[:].astype(f32), (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        dh3 = _gelu_grad(h3, dg3)

        # c3 (kxk)
        rc = _row_coords(bchw, cfg)
        _conv_taps_bwd_weights(g2, dh3, dws["dw3"], cfg, rc, cdtype)
        dws["db3"][:, :] += jnp.sum(dh3, axis=0, keepdims=True)
        dg2 = _conv_taps_bwd_input(dh3, w3, cfg, rc, cdtype)
        dh2 = _gelu_grad(h2, dg2)

        # c2 (kxk)
        g0 = _gelu(x).astype(cdtype)
        _conv_taps_bwd_weights(g1, dh2, dws["dw2"], cfg, rc, cdtype)
        dws["db2"][:, :] += jnp.sum(dh2, axis=0, keepdims=True)
        dg1 = _conv_taps_bwd_input(dh2, w2, cfg, rc, cdtype)
        dh1 = _gelu_grad(h1, dg1)

        # c1 (1x1)
        dws["dw1"][:, :] += _dot_t(g0, dh1.astype(cdtype))
        dws["db1"][:, :] += jnp.sum(dh1, axis=0, keepdims=True)
        dg0 = jax.lax.dot_general(
            dh1.astype(cdtype), w1[:].astype(cdtype),
            (((1,), (1,)), ((), ())), preferred_element_type=f32,
        )
        dx = dout + _gelu_grad(x, dg0)

        dx0_ref[:] = dx.astype(dx0_ref.dtype)
        d_scr[:] = dx

    return kernel


def _compiler_params():
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        # The default scoped-vmem limit is 16 MB; the bwd kernel's stack
        # temporaries (18 masked tap shifts + matmul operands live across
        # the accumulation) land within ~24 KB of it at the f32 MNIST
        # res-28 shapes depending on the surrounding program's operand
        # copies. Raise the ceiling so marginal programs compile; the
        # measured working set still pipelines fine (32-34 steps/s).
        vmem_limit_bytes=100 * 1024 * 1024,
    )


@functools.lru_cache(maxsize=64)
def _build_chain(cfg: BlockChainConfig, batch: int, L: int):
    """Builds the custom_vjp'd chain for one static config.

    Returned callable: ``fn(x0, *stacked_weights) -> x_final`` with ``x0``
    flat ``[batch*h*w, cin]`` and weights ``[L, rows, cols]`` stacks
    (:func:`weight_shapes` order)."""
    hw = cfg.h * cfg.w
    cdtype = jnp.dtype(cfg.cdtype)
    wshapes = weight_shapes(cfg)
    wnames = [n for n, _ in wshapes]
    shp = dict(wshapes)

    if batch % cfg.bc_fwd or batch % cfg.bc_bwd:
        raise ValueError(
            f"batch {batch} not divisible by chunks ({cfg.bc_fwd}, "
            f"{cfg.bc_bwd})"
        )
    ncf = batch // cfg.bc_fwd
    ncb = batch // cfg.bc_bwd

    # grid is (chunk, level) with LEVEL fastest — index maps get (i, l)
    def chunk_spec(bc, cols):
        return pl.BlockSpec((bc * hw, cols), lambda i, l: (i, 0))

    def lvl_spec(bc, cols, nc, rev=False):
        if rev:
            return pl.BlockSpec(
                (bc * hw, cols), lambda i, l: ((L - 1 - l) * nc + i, 0)
            )
        return pl.BlockSpec((bc * hw, cols), lambda i, l: (l * nc + i, 0))

    def w_spec(name, rev=False):
        rows, cols = shp[name]
        if rev:
            return pl.BlockSpec(
                (1, rows, cols), lambda i, l: (L - 1 - l, 0, 0)
            )
        return pl.BlockSpec((1, rows, cols), lambda i, l: (l, 0, 0))

    def dw_spec(name):
        # whole-stack block, constant index map: resident across the launch
        rows, cols = shp[name]
        return pl.BlockSpec((L, rows, cols), lambda i, l: (0, 0, 0))

    fwd_kernel = _fwd_kernel_factory(cfg, L)
    bwd_kernel = _bwd_kernel_factory(cfg, L)

    def fwd_call(x0, weights_s):
        bc = cfg.bc_fwd
        in_specs = [chunk_spec(bc, cfg.cin)]
        args = [x0]
        for n in wnames:
            in_specs.append(w_spec(n))
            args.append(weights_s[n])
        # xout saves ride f32 (the residual stream, see kernel); h1..h3
        # saves ride compute dtype.  The chain's final output is the last
        # level's rows of the xout stack — no separate output buffer.
        out_specs = []
        out_shape = []
        for cols, dt in ((cfg.cin, f32), (cfg.mid, cdtype),
                         (cfg.mid, cdtype), (cfg.mid, cdtype)):
            out_specs.append(lvl_spec(bc, cols, ncf))
            out_shape.append(
                jax.ShapeDtypeStruct((L * batch * hw, cols), dt)
            )
        return pl.pallas_call(
            fwd_kernel,
            grid=(ncf, L),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((bc * hw, cfg.cin), f32)],
            interpret=cfg.interpret,
            compiler_params=_compiler_params(),
        )(*args)

    def xprev_spec(bc, nc):
        # streams xout[lvl - 1] for the bwd's level-input reconstruction;
        # clamped at lvl == 0 (actual level = L - 1 - l on the reversed
        # sweep, so the xout slot is L - 2 - l), where the kernel reads
        # x0 instead and the fetched slot-0 block is ignored
        return pl.BlockSpec(
            (bc * hw, cfg.cin),
            lambda i, l: (jnp.maximum(L - 2 - l, 0) * nc + i, 0),
        )

    def bwd_call(g, x0, saves, weights_s):
        bc = cfg.bc_bwd
        xout, h1, h2, h3 = saves
        in_specs = [chunk_spec(bc, cfg.cin), chunk_spec(bc, cfg.cin)]
        args = [g, x0]
        in_specs.append(xprev_spec(bc, ncb))
        args.append(xout)
        for a, cols in ((h1, cfg.mid), (h2, cfg.mid), (h3, cfg.mid)):
            in_specs.append(lvl_spec(bc, cols, ncb, rev=True))
            args.append(a)
        for n in ("w1", "w2", "w3", "w4"):
            in_specs.append(w_spec(n, rev=True))
            args.append(weights_s[n])
        out_specs = [chunk_spec(bc, cfg.cin)]          # dx0 (f32 carry)
        out_shape = [
            jax.ShapeDtypeStruct((batch * hw, cfg.cin), f32)
        ]
        for n in wnames:                               # stacked f32 dW
            rows, cols = shp[n]
            out_specs.append(dw_spec(n))               # resident full stack
            out_shape.append(jax.ShapeDtypeStruct((L, rows, cols), f32))
        return pl.pallas_call(
            bwd_kernel,
            grid=(ncb, L),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((bc * hw, cfg.cin), f32)],
            interpret=cfg.interpret,
            compiler_params=_compiler_params(),
        )(*args)

    @jax.custom_vjp
    def chain(*flat):
        x0, weights_s = flat[0], dict(zip(wnames, flat[1:]))
        xout = fwd_call(x0, weights_s)[0]
        return jax.lax.slice_in_dim(xout, (L - 1) * batch * hw, L * batch * hw)

    def chain_fwd(*flat):
        x0, weights_s = flat[0], dict(zip(wnames, flat[1:]))
        xout, h1, h2, h3 = fwd_call(x0, weights_s)
        out = jax.lax.slice_in_dim(xout, (L - 1) * batch * hw, L * batch * hw)
        return out, (x0, (xout, h1, h2, h3), weights_s)

    def chain_bwd(res, g):
        x0, saves, weights_s = res
        outs = bwd_call(g, x0, saves, weights_s)
        dx0, dws = outs[0], outs[1:]
        return (dx0, *dws)

    chain.defvjp(chain_fwd, chain_bwd)
    return chain


def chain_supported(batch: int, h: int, w: int, compute_dtype=jnp.float32) -> bool:
    """Whether the chain kernels can legally tile this geometry: even the
    full-batch chunk must satisfy Mosaic's sublane rule for the per-level
    save blocks (``batch*h*w`` divisible by 8, 16 at sub-4-byte compute).
    Callers fall back to the unfused XLA blocks when False (only tiny test
    geometries fail — e.g. batch 2 at a 1x1 resolution)."""
    mod = 16 if jnp.dtype(compute_dtype).itemsize < 4 else 8
    return (batch * h * w) % mod == 0


def _snap_chunk(bc: int, batch: int, hw: int, mod: int) -> int:
    """Largest batch divisor <= the requested chunk whose block leading dim
    ``bc*hw`` satisfies Mosaic's sublane-tiling rule (divisible by 8, 16 at
    bf16) — else the smallest legal divisor, else the full batch (a block
    equal to the whole array is always legal)."""
    divs = [
        d for d in range(1, batch + 1)
        if batch % d == 0 and (d * hw) % mod == 0
    ]
    if not divs:
        return batch
    le = [d for d in divs if d <= bc]
    return max(le) if le else min(divs)


def block_chain(
    x,
    weights,
    *,
    mid: int,
    k: int,
    compute_dtype=jnp.float32,
    bc_fwd: int = 1,
    bc_bwd: int = 1,
    interpret: bool = False,
):
    """Runs L consecutive residual bottleneck blocks as ONE streamed fwd
    kernel + ONE streamed bwd kernel.

    Args:
        x: ``[B, H, W, C]`` chain input.
        weights: dict of stacked kernel-native weights (``[L, rows, cols]``
            per :func:`weight_shapes`) OR a per-level list of dicts of the
            same names (stacked here).
        mid: bottleneck width; ``k``: conv kernel size of c2/c3 (1 or 3).

    Returns ``[B, H, W, C]`` — the last block's output (drop-in for the
    sequential flax Blocks; reference vdvae.py:287-328 applies
    downsampling and channel padding OUTSIDE the run).
    """
    import os

    # on-chip VMEM tuning knobs (measurement sweeps without code edits);
    # chunk sizes trade VMEM footprint against per-matmul size
    bc_fwd = int(os.environ.get("PM_TPU_BLOCK_BC_FWD", bc_fwd))
    bc_bwd = int(os.environ.get("PM_TPU_BLOCK_BC_BWD", bc_bwd))

    b, h, w_, c = x.shape
    if isinstance(weights, dict):
        stacked = weights
        L = int(next(iter(weights.values())).shape[0])
    else:
        L = len(weights)
        stacked = {
            n: jnp.stack([wl[n] for wl in weights])
            for n in weights[0]
        }
    cdt = jnp.dtype(compute_dtype)
    mod = 16 if cdt.itemsize < 4 else 8   # h-save blocks ride compute dtype
    cfg = BlockChainConfig(
        h=h, w=w_, cin=c, mid=mid, k=k,
        cdtype=cdt.name,
        bc_fwd=_snap_chunk(bc_fwd, b, h * w_, mod),
        bc_bwd=_snap_chunk(bc_bwd, b, h * w_, mod),
        interpret=interpret,
    )
    fn = _build_chain(cfg, b, L)
    shapes = dict(weight_shapes(cfg))
    cdtype = cdt
    flat = [x.reshape(b * h * w_, c).astype(f32)]
    for n in shapes:
        arr = stacked[n]
        exp = (L, *shapes[n])
        if arr.shape != exp:
            raise ValueError(f"{n}: expected {exp}, got {arr.shape}")
        # biases and c4 stay f32 (residual stream); w1-w3 ride compute dtype
        flat.append(
            arr.astype(f32) if (n.startswith("b") or n == "w4")
            else arr.astype(cdtype)
        )
    out = fn(*flat)
    return out.reshape(b, h, w_, c).astype(f32)
