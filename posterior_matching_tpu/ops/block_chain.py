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

- grid ``(level, chunk)`` with the chunk axis fastest; per-level weights are
  stacked ``[L, rows, cols]`` and streamed by the level grid index, so one
  level's weights are resident while Mosaic prefetches the next;
- the x carry between levels lives in a full-batch VMEM scratch; the only
  HBM activation traffic is the per-level saves the backward needs
  (block input x_l and the three pre-gelu intermediates h1/h2/h3);
- per-level weight gradients accumulate in resident f32 output blocks
  across the chunk sweep (standard Pallas accumulation; chunk-fastest makes
  all visits of one level consecutive);
- the kxk convs run as k*k shifted-tap MXU matmuls over the full (padded)
  spatial extent held in VMEM — no halo exchange, the whole [bc, H, W, C]
  chunk is resident (H <= 28 at the VDVAE shapes);
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
    bc_fwd: int = 4
    bc_bwd: int = 2
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


def _conv_taps_fwd(g2, w_ref, cfg, bc, cdtype):
    """kxk SAME conv as k*k shifted-tap matmuls.

    ``g2`` is [bc*h*w, mid]; ``w_ref`` a ``_Lvl`` view of [k*k*mid, mid].
    Returns the f32 accumulator [bc*h*w, mid]."""
    h, w_, m, k = cfg.h, cfg.w, cfg.mid, cfg.k
    if k == 1:
        return _dot(g2, w_ref[:].astype(cdtype))
    p = k // 2
    g4 = g2.reshape(bc, h, w_, m)
    gp = jnp.pad(g4, ((0, 0), (p, p), (p, p), (0, 0)))
    acc = None
    for dr in range(k):
        for dc in range(k):
            t = dr * k + dc
            x2 = gp[:, dr : dr + h, dc : dc + w_, :].reshape(-1, m)
            part = _dot(x2, w_ref[pl.ds(t * m, m), :].astype(cdtype))
            acc = part if acc is None else acc + part
    return acc


def _conv_taps_bwd_input(dh, w_ref, cfg, bc, cdtype):
    """Input cotangent of the kxk SAME conv: mirrored-tap matmuls with
    ``w[t]^T`` (pad the output cotangent by k//2, slice at (k-1-dr, k-1-dc))."""
    h, w_, m, k = cfg.h, cfg.w, cfg.mid, cfg.k
    if k == 1:
        return jax.lax.dot_general(
            dh.astype(cdtype), w_ref[:].astype(cdtype),
            (((1,), (1,)), ((), ())), preferred_element_type=f32,
        )
    p = k // 2
    d4 = dh.reshape(bc, h, w_, m)
    dp = jnp.pad(d4, ((0, 0), (p, p), (p, p), (0, 0)))
    acc = None
    for dr in range(k):
        for dc in range(k):
            t = dr * k + dc
            x2 = dp[
                :, (k - 1 - dr) : (k - 1 - dr) + h,
                (k - 1 - dc) : (k - 1 - dc) + w_, :,
            ].reshape(-1, m)
            # dh @ w[t]^T: contract on the OUT axis of w[t]
            part = jax.lax.dot_general(
                x2.astype(cdtype), w_ref[pl.ds(t * m, m), :].astype(cdtype),
                (((1,), (1,)), ((), ())), preferred_element_type=f32,
            )
            acc = part if acc is None else acc + part
    return acc


def _conv_taps_bwd_weights(g2, dh, dw_ref, cfg, bc, cdtype):
    """Accumulates the kxk conv's weight gradient into the resident f32
    ``dw_ref`` ([k*k*mid, mid]): ``dW[t] += shifted(g2, t)^T @ dh``."""
    h, w_, m, k = cfg.h, cfg.w, cfg.mid, cfg.k
    dhc = dh.astype(cdtype)
    if k == 1:
        dw_ref[:, :] += _dot_t(g2, dhc)
        return
    p = k // 2
    g4 = g2.reshape(bc, h, w_, m)
    gp = jnp.pad(g4, ((0, 0), (p, p), (p, p), (0, 0)))
    for dr in range(k):
        for dc in range(k):
            t = dr * k + dc
            x2 = gp[:, dr : dr + h, dc : dc + w_, :].reshape(-1, m)
            dw_ref[pl.ds(t * m, m), :] += _dot_t(x2, dhc)


def _fwd_kernel_factory(cfg: BlockChainConfig, L: int):
    bc = cfg.bc_fwd
    bchw = bc * cfg.h * cfg.w
    cdtype = jnp.dtype(cfg.cdtype)

    def kernel(x0_ref, w1, b1, w2, b2, w3, b3, w4, b4,
               out_ref, xin_ref, h1_ref, h2_ref, h3_ref, x_scr):
        w1, b1, w2, b2, w3, b3, w4, b4 = map(
            _Lvl, (w1, b1, w2, b2, w3, b3, w4, b4)
        )
        l = pl.program_id(0)
        i = pl.program_id(1)
        rows = pl.ds(i * bchw, bchw)

        # The residual stream stays f32 even at bf16 compute — the flax
        # Block's c4 runs at dtype=None so its f32 params promote the block
        # output back to f32 (models/vdvae.py:116-119); c1-c3 and the taps
        # run at compute dtype.
        x = jnp.where(l == 0, x0_ref[:], x_scr[rows])

        g0 = _gelu(x).astype(cdtype)
        h1 = _dot(g0, w1[:].astype(cdtype)) + b1[:].astype(f32)
        g1 = _gelu(h1).astype(cdtype)
        h2 = _conv_taps_fwd(g1, w2, cfg, bc, cdtype) + b2[:].astype(f32)
        g2 = _gelu(h2).astype(cdtype)
        h3 = _conv_taps_fwd(g2, w3, cfg, bc, cdtype) + b3[:].astype(f32)
        g3 = _gelu(h3)                                  # f32 (c4 is f32)
        h4 = _dot(g3, w4[:].astype(f32)) + b4[:].astype(f32)
        out = x + h4

        xin_ref[:] = x
        h1_ref[:] = h1.astype(h1_ref.dtype)
        h2_ref[:] = h2.astype(h2_ref.dtype)
        h3_ref[:] = h3.astype(h3_ref.dtype)
        out_ref[:] = out
        x_scr[rows] = out

    return kernel


def _bwd_kernel_factory(cfg: BlockChainConfig, L: int):
    bc = cfg.bc_bwd
    bchw = bc * cfg.h * cfg.w
    cdtype = jnp.dtype(cfg.cdtype)

    def kernel(g_ref, xin_ref, h1_ref, h2_ref, h3_ref,
               w1, w2, w3, w4,
               dx0_ref, dw1, db1, dw2, db2, dw3, db3, dw4, db4, d_scr):
        w1, w2, w3, w4 = map(_Lvl, (w1, w2, w3, w4))
        dws = dict(
            dw1=_Lvl(dw1), db1=_Lvl(db1), dw2=_Lvl(dw2), db2=_Lvl(db2),
            dw3=_Lvl(dw3), db3=_Lvl(db3), dw4=_Lvl(dw4), db4=_Lvl(db4),
        )
        j = pl.program_id(0)          # reversed: actual level = L - 1 - j
        i = pl.program_id(1)
        rows = pl.ds(i * bchw, bchw)

        @pl.when(i == 0)
        def _init():
            for ad in dws.values():
                ad.ref[:] = jnp.zeros(ad.ref.shape, ad.ref.dtype)

        # Only the chain's FINAL output has an external cotangent (the
        # encoder records just the last activation per resolution run);
        # inner levels read the carried cotangent from scratch.
        dout = jnp.where(j == 0, g_ref[:].astype(f32), d_scr[rows].astype(f32))

        x = xin_ref[:]
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
        _conv_taps_bwd_weights(g2, dh3, dws["dw3"], cfg, bc, cdtype)
        dws["db3"][:, :] += jnp.sum(dh3, axis=0, keepdims=True)
        dg2 = _conv_taps_bwd_input(dh3, w3, cfg, bc, cdtype)
        dh2 = _gelu_grad(h2, dg2)

        # c2 (kxk)
        g0 = _gelu(x).astype(cdtype)
        _conv_taps_bwd_weights(g1, dh2, dws["dw2"], cfg, bc, cdtype)
        dws["db2"][:, :] += jnp.sum(dh2, axis=0, keepdims=True)
        dg1 = _conv_taps_bwd_input(dh2, w2, cfg, bc, cdtype)
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
        d_scr[rows] = dx.astype(d_scr.dtype)

    return kernel


def _compiler_params():
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
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

    def chunk_spec(bc, cols):
        return pl.BlockSpec((bc * hw, cols), lambda l, i: (i, 0))

    def lvl_spec(bc, cols, nc, rev=False):
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

    fwd_kernel = _fwd_kernel_factory(cfg, L)
    bwd_kernel = _bwd_kernel_factory(cfg, L)

    def fwd_call(x0, weights_s):
        bc = cfg.bc_fwd
        in_specs = [chunk_spec(bc, cfg.cin)]
        args = [x0]
        for n in wnames:
            in_specs.append(w_spec(n))
            args.append(weights_s[n])
        # final out + xin saves ride f32 (the residual stream, see kernel);
        # h1..h3 saves ride compute dtype.
        out_specs = [chunk_spec(bc, cfg.cin)]         # final out
        out_shape = [
            jax.ShapeDtypeStruct((batch * hw, cfg.cin), f32)
        ]
        for cols, dt in ((cfg.cin, f32), (cfg.mid, cdtype),
                         (cfg.mid, cdtype), (cfg.mid, cdtype)):
            out_specs.append(lvl_spec(bc, cols, ncf))
            out_shape.append(
                jax.ShapeDtypeStruct((L * batch * hw, cols), dt)
            )
        return pl.pallas_call(
            fwd_kernel,
            grid=(L, ncf),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((batch * hw, cfg.cin), f32)],
            interpret=cfg.interpret,
            compiler_params=_compiler_params(),
        )(*args)

    def bwd_call(g, saves, weights_s):
        bc = cfg.bc_bwd
        xin, h1, h2, h3 = saves
        in_specs = [chunk_spec(bc, cfg.cin)]
        args = [g]
        for a, cols in ((xin, cfg.cin), (h1, cfg.mid), (h2, cfg.mid),
                        (h3, cfg.mid)):
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
            out_specs.append(w_spec(n, rev=True))
            out_shape.append(jax.ShapeDtypeStruct((L, rows, cols), f32))
        return pl.pallas_call(
            bwd_kernel,
            grid=(L, ncb),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((batch * hw, cfg.cin), f32)],
            interpret=cfg.interpret,
            compiler_params=_compiler_params(),
        )(*args)

    @jax.custom_vjp
    def chain(*flat):
        x0, weights_s = flat[0], dict(zip(wnames, flat[1:]))
        return fwd_call(x0, weights_s)[0]

    def chain_fwd(*flat):
        x0, weights_s = flat[0], dict(zip(wnames, flat[1:]))
        out, xin, h1, h2, h3 = fwd_call(x0, weights_s)
        return out, ((xin, h1, h2, h3), weights_s)

    def chain_bwd(res, g):
        saves, weights_s = res
        outs = bwd_call(g, saves, weights_s)
        dx0, dws = outs[0], outs[1:]
        return (dx0, *dws)

    chain.defvjp(chain_fwd, chain_bwd)
    return chain


def _snap_chunk(bc: int, batch: int) -> int:
    while batch % bc:
        bc -= 1
    return bc


def block_chain(
    x,
    weights,
    *,
    mid: int,
    k: int,
    compute_dtype=jnp.float32,
    bc_fwd: int = 4,
    bc_bwd: int = 2,
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
    cfg = BlockChainConfig(
        h=h, w=w_, cin=c, mid=mid, k=k,
        cdtype=jnp.dtype(compute_dtype).name,
        bc_fwd=_snap_chunk(bc_fwd, b), bc_bwd=_snap_chunk(bc_bwd, b),
        interpret=interpret,
    )
    fn = _build_chain(cfg, b, L)
    shapes = dict(weight_shapes(cfg))
    cdtype = jnp.dtype(compute_dtype)
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
