"""Pallas streamed chain kernels for VDVAE DECODER-block runs.

Round-4 closed the encoder half: fusing each resolution's run of bottleneck
blocks into one fwd + one bwd kernel took `pm_vdvae_mnist` 15.2 -> 33.8
steps/s (ops/block_chain.py).  The decoder's ~29 blocks (reference
vdvae.py:479-754) — per block a diag-posterior Block, a TriL
masked-posterior Block (fed a stop-gradient of the decoder state), a prior
Block whose tail updates the state, a z sample, a 1x1 z-projection, and a
residual resnet Block — remained fragmented XLA: ~17 sequential tiny
matmuls per block with an HBM round trip each.  This module fuses one
RESOLUTION's whole run of DecoderBlocks (mixin/bias-input prep stays
outside, applied to the chain's x0) into ONE forward and ONE backward
kernel:

- grid ``(chunk, level)``, LEVEL fastest, exactly block_chain's layout: the
  decoder state x rides a chunk-sized VMEM scratch; the per-level weights
  (4 Blocks' stacks + z_proj, ~0.3 MB/level f32) are streamed by the level
  grid index;
- ``acts``/``masked_acts`` (the encoder activations at this resolution) are
  LEVEL-INVARIANT chunk inputs — fetched once per chunk, reused by every
  level; their cotangents accumulate across the level sweep in VMEM scratch
  and flush once per chunk;
- the z sample uses PRE-DRAWN eps streamed per level: the wrapper draws
  ``eps_l`` through each block module's own ``make_rng("sample")`` so the
  fold-in path (and therefore every sampled bit) is IDENTICAL to the
  unfused per-block path — fused == unfused is testable to float
  tolerance, no distribution-level handwaving;
- per-level semantic outputs (posterior c4 out [2*ld], prior head [2*ld],
  masked-posterior raw params [ld + tril]) stream to HBM for the
  decoder-level batched KL / pm_kl (models/vdvae.py::Decoder), and carry
  EXTERNAL COTANGENTS back into the backward kernel; the reference's
  stop-gradients (pm stats outside, the masked block's x input here) are
  enforced structurally — the masked block's input cotangent simply never
  reaches x;
- the backward reconstructs each level's inner carries from the saves: x_l
  is the previous level's xout stream, h (prior tail) and z (posterior
  params) are recomputed from the saved pre-gelu h3's via their 1x1 c4's —
  saving them too would roughly double the save traffic to spare two cheap
  matmuls;
- softplus runs as ``max(x,0) + log(1+exp(-|x|))`` (jax.nn.softplus lowers
  through log1p, which Mosaic lacks — same issue class as expm1/elu,
  ops/gated_block.py::_elu); matches to f32 rounding.

Dtype rules follow the flax Block exactly (models/vdvae.py:116-119): c1-c3
and the kxk taps at compute dtype; every c4, the z/z_proj path, and the
decoder state in f32.

Reference behavior: vdvae.py:479-754 (PosteriorMatchingDecoderBlock) and
:757-824 (decoder chain); geometry per configs/pm_vdvae_mnist.py
(width 192, mid 48, latent 16, runs 28x7, 14x5, 7x3, 3x3, 1x2).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from posterior_matching_tpu.ops.gated_block import _dot, _dot_t
from posterior_matching_tpu.ops.block_chain import (
    _StackLvl,
    _conv_taps_bwd_input,
    _conv_taps_bwd_weights,
    _conv_taps_fwd,
    _gelu,
    _gelu_grad,
    _row_coords,
    _snap_chunk,
)

f32 = jnp.float32

_SAVE_NAMES = (
    "ph1", "ph2", "ph3", "mh1", "mh2", "mh3",
    "qh1", "qh2", "qh3", "rh1", "rh2", "rh3",
)


def _softplus(x):
    xf = x.astype(f32)
    return jnp.maximum(xf, 0.0) + jnp.log(1.0 + jnp.exp(-jnp.abs(xf)))


class DecChainConfig(NamedTuple):
    """Static geometry of one decoder-run launch (hashable lru_cache key)."""

    h: int
    w: int
    width: int      # decoder state width
    awidth: int     # encoder activation width at this resolution
    mid: int        # bottleneck width
    ld: int         # latent dim
    tril: int       # tril_size(ld)
    k: int          # kxk conv size of c2/c3 (3 at res > 2 else 1)
    cdtype: str = "float32"
    bc_fwd: int = 1
    bc_bwd: int = 1
    interpret: bool = False


def _block_defs(cfg: DecChainConfig):
    """(tag, c1 input width, c4 output width) of the four sub-Blocks."""
    return [
        ("p", cfg.width + cfg.awidth, 2 * cfg.ld),            # posterior
        ("m", cfg.width + cfg.awidth, cfg.ld + cfg.tril),     # masked post.
        ("q", cfg.width, 2 * cfg.ld + cfg.width),             # prior
        ("r", cfg.width, cfg.width),                          # resnet
    ]


def weight_shapes(cfg: DecChainConfig):
    kk = cfg.k * cfg.k
    shapes = []
    for tag, cin, cout in _block_defs(cfg):
        shapes += [
            (f"{tag}_w1", (cin, cfg.mid)),
            (f"{tag}_b1", (1, cfg.mid)),
            (f"{tag}_w2", (kk * cfg.mid, cfg.mid)),
            (f"{tag}_b2", (1, cfg.mid)),
            (f"{tag}_w3", (kk * cfg.mid, cfg.mid)),
            (f"{tag}_b3", (1, cfg.mid)),
            (f"{tag}_w4", (cfg.mid, cout)),
            (f"{tag}_b4", (1, cout)),
        ]
    shapes += [("wz", (cfg.ld, cfg.width)), ("bz", (1, cfg.width))]
    return shapes


class _Lvl:
    """Rank-2 view of one level's [1, rows, cols] weight block."""

    __slots__ = ("ref",)

    def __init__(self, ref):
        self.ref = ref

    def __getitem__(self, idx):
        return self.ref[(0, *(idx if isinstance(idx, tuple) else (idx,)))]

    @property
    def dtype(self):
        return self.ref.dtype


def _sub_fwd(w, tag, x_in, cfg, rc, cdtype):
    """One bottleneck Block forward (gelu->c1->gelu->c2->gelu->c3->gelu->c4,
    NO residual add — callers handle residual/head wiring).  Returns
    (h1, h2, h3, h4) with h4 f32 (c4 runs f32, the flax Block contract)."""
    g0 = _gelu(x_in).astype(cdtype)
    h1 = _dot(g0, w[f"{tag}_w1"][:].astype(cdtype)) + (
        w[f"{tag}_b1"][:].astype(f32)
    )
    g1 = _gelu(h1).astype(cdtype)
    h2 = _conv_taps_fwd(g1, w[f"{tag}_w2"], cfg, rc, cdtype) + (
        w[f"{tag}_b2"][:].astype(f32)
    )
    g2 = _gelu(h2).astype(cdtype)
    h3 = _conv_taps_fwd(g2, w[f"{tag}_w3"], cfg, rc, cdtype) + (
        w[f"{tag}_b3"][:].astype(f32)
    )
    g3 = _gelu(h3)                                           # f32
    h4 = _dot(g3, w[f"{tag}_w4"][:].astype(f32)) + (
        w[f"{tag}_b4"][:].astype(f32)
    )
    return h1, h2, h3, h4


def _sub_bwd(w, dw, tag, x_in, h1, h2, h3, dh4, cfg, rc, cdtype):
    """Backward of :func:`_sub_fwd` given the c4-output cotangent ``dh4``
    (f32).  Accumulates this block's dW stacks and returns the cotangent of
    ``x_in`` (f32, w.r.t. the PRE-gelu input)."""
    g1 = _gelu(h1).astype(cdtype)
    g2 = _gelu(h2).astype(cdtype)
    g3 = _gelu(h3)                                           # f32
    g0 = _gelu(x_in).astype(cdtype)

    dw[f"{tag}_w4"][:, :] += _dot_t(g3, dh4)
    dw[f"{tag}_b4"][:, :] += jnp.sum(dh4, axis=0, keepdims=True)
    dg3 = jax.lax.dot_general(
        dh4, w[f"{tag}_w4"][:].astype(f32), (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    dh3 = _gelu_grad(h3, dg3)

    _conv_taps_bwd_weights(g2, dh3, dw[f"{tag}_w3"], cfg, rc, cdtype)
    dw[f"{tag}_b3"][:, :] += jnp.sum(dh3, axis=0, keepdims=True)
    dg2 = _conv_taps_bwd_input(dh3, w[f"{tag}_w3"], cfg, rc, cdtype)
    dh2 = _gelu_grad(h2, dg2)

    _conv_taps_bwd_weights(g1, dh2, dw[f"{tag}_w2"], cfg, rc, cdtype)
    dw[f"{tag}_b2"][:, :] += jnp.sum(dh2, axis=0, keepdims=True)
    dg1 = _conv_taps_bwd_input(dh2, w[f"{tag}_w2"], cfg, rc, cdtype)
    dh1 = _gelu_grad(h1, dg1)

    dw[f"{tag}_w1"][:, :] += _dot_t(g0, dh1.astype(cdtype))
    dw[f"{tag}_b1"][:, :] += jnp.sum(dh1, axis=0, keepdims=True)
    dg0 = jax.lax.dot_general(
        dh1.astype(cdtype), w[f"{tag}_w1"][:].astype(cdtype),
        (((1,), (1,)), ((), ())), preferred_element_type=f32,
    )
    return _gelu_grad(x_in, dg0)


def _recompute_uz(w, saves, x, eps, ld):
    """(u, z, raw) of a level from its saves: u is the resnet input, z the
    latent sample, raw the unconstrained posterior scale params."""
    qg3 = _gelu(saves["qh3"][:])
    prior_out = _dot(qg3, w["q_w4"][:].astype(f32)) + (
        w["q_b4"][:].astype(f32)
    )
    htail = prior_out[:, 2 * ld :]
    pg3 = _gelu(saves["ph3"][:])
    post = _dot(pg3, w["p_w4"][:].astype(f32)) + w["p_b4"][:].astype(f32)
    loc = post[:, :ld]
    raw = post[:, ld:]
    z = loc + (_softplus(raw) + 1e-5) * eps
    u = x + htail + _dot(z, w["wz"][:].astype(f32)) + (
        w["bz"][:].astype(f32)
    )
    return u, z, raw


def _fwd_kernel_factory(cfg: DecChainConfig, L: int):
    bc = cfg.bc_fwd
    bchw = bc * cfg.h * cfg.w
    cdtype = jnp.dtype(cfg.cdtype)
    wnames = [n for n, _ in weight_shapes(cfg)]
    ld = cfg.ld

    def kernel(*refs):
        it = iter(refs)
        x0_ref, acts_ref, macts_ref, eps_ref = (next(it) for _ in range(4))
        w = {n: _Lvl(next(it)) for n in wnames}
        (xout_ref, post_ref, prior_ref, mask_ref) = (
            next(it) for _ in range(4)
        )
        hsave = {n: next(it) for n in _SAVE_NAMES}
        x_scr = next(it)

        l = pl.program_id(1)
        x = jnp.where(l == 0, x0_ref[:].astype(f32), x_scr[:])
        acts = acts_ref[:].astype(f32)
        macts = macts_ref[:].astype(f32)
        rc = _row_coords(bchw, cfg)

        in_p = jnp.concatenate([x, acts], axis=-1)
        h1, h2, h3, post = _sub_fwd(w, "p", in_p, cfg, rc, cdtype)
        hsave["ph1"][:] = h1.astype(hsave["ph1"].dtype)
        hsave["ph2"][:] = h2.astype(hsave["ph2"].dtype)
        hsave["ph3"][:] = h3.astype(hsave["ph3"].dtype)
        post_ref[:] = post

        # masked posterior (x enters stop-gradient: the bwd never routes
        # this block's input cotangent to x)
        in_m = jnp.concatenate([x, macts], axis=-1)
        h1, h2, h3, mask_out = _sub_fwd(w, "m", in_m, cfg, rc, cdtype)
        hsave["mh1"][:] = h1.astype(hsave["mh1"].dtype)
        hsave["mh2"][:] = h2.astype(hsave["mh2"].dtype)
        hsave["mh3"][:] = h3.astype(hsave["mh3"].dtype)
        mask_ref[:] = mask_out

        h1, h2, h3, prior_out = _sub_fwd(w, "q", x, cfg, rc, cdtype)
        hsave["qh1"][:] = h1.astype(hsave["qh1"].dtype)
        hsave["qh2"][:] = h2.astype(hsave["qh2"].dtype)
        hsave["qh3"][:] = h3.astype(hsave["qh3"].dtype)
        prior_ref[:] = prior_out[:, : 2 * ld]
        htail = prior_out[:, 2 * ld :]

        loc = post[:, :ld]
        raw = post[:, ld:]
        z = loc + (_softplus(raw) + 1e-5) * eps_ref[:].astype(f32)

        u = x + htail + _dot(z, w["wz"][:].astype(f32)) + (
            w["bz"][:].astype(f32)
        )
        h1, h2, h3, h4 = _sub_fwd(w, "r", u, cfg, rc, cdtype)
        hsave["rh1"][:] = h1.astype(hsave["rh1"].dtype)
        hsave["rh2"][:] = h2.astype(hsave["rh2"].dtype)
        hsave["rh3"][:] = h3.astype(hsave["rh3"].dtype)
        out = u + h4

        xout_ref[:] = out
        x_scr[:] = out

    return kernel


def _bwd_kernel_factory(cfg: DecChainConfig, L: int):
    bc = cfg.bc_bwd
    bchw = bc * cfg.h * cfg.w
    cdtype = jnp.dtype(cfg.cdtype)
    wnames = [n for n, _ in weight_shapes(cfg)]
    ld, wd = cfg.ld, cfg.width

    def kernel(*refs):
        it = iter(refs)
        (g_ref, gpost_ref, gprior_ref, gmask_ref,
         x0_ref, xprev_ref, acts_ref, macts_ref, eps_ref) = (
            next(it) for _ in range(9)
        )
        saves = {n: next(it) for n in _SAVE_NAMES}
        w = {n: _Lvl(next(it)) for n in wnames}
        dx0_ref, dacts_ref, dmacts_ref = (next(it) for _ in range(3))
        dw_stacks = {n: next(it) for n in wnames}
        d_scr, dacts_scr, dmacts_scr = (next(it) for _ in range(3))

        i = pl.program_id(0)
        j = pl.program_id(1)                 # reversed level sweep
        lvl = L - 1 - j
        dw = {n: _StackLvl(dw_stacks[n], lvl) for n in wnames}

        @pl.when((i == 0) & (j == 0))
        def _init_dw():
            for ref in dw_stacks.values():
                ref[:] = jnp.zeros(ref.shape, ref.dtype)

        @pl.when(j == 0)
        def _init_dacts():
            dacts_scr[:] = jnp.zeros(dacts_scr.shape, dacts_scr.dtype)
            dmacts_scr[:] = jnp.zeros(dmacts_scr.shape, dmacts_scr.dtype)

        dout = jnp.where(j == 0, g_ref[:].astype(f32), d_scr[:])
        x = jnp.where(lvl == 0, x0_ref[:].astype(f32), xprev_ref[:])
        acts = acts_ref[:].astype(f32)
        macts = macts_ref[:].astype(f32)
        eps = eps_ref[:].astype(f32)
        rc = _row_coords(bchw, cfg)

        u, z, raw = _recompute_uz(w, saves, x, eps, ld)

        # ---- resnet (residual) -------------------------------------------
        din_r = _sub_bwd(
            w, dw, "r", u, saves["rh1"][:], saves["rh2"][:],
            saves["rh3"][:], dout, cfg, rc, cdtype,
        )
        du = dout + din_r

        # ---- z_proj + reparameterized sample -----------------------------
        dz = jax.lax.dot_general(
            du, w["wz"][:].astype(f32), (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        dw["wz"][:, :] += _dot_t(z, du)
        dw["bz"][:, :] += jnp.sum(du, axis=0, keepdims=True)
        draw = dz * eps * jax.nn.sigmoid(raw)    # d softplus = sigmoid

        # ---- posterior block ---------------------------------------------
        dh4_p = gpost_ref[:].astype(f32) + jnp.concatenate(
            [dz, draw], axis=-1
        )
        din_p = _sub_bwd(
            w, dw, "p", jnp.concatenate([x, acts], axis=-1),
            saves["ph1"][:], saves["ph2"][:], saves["ph3"][:],
            dh4_p, cfg, rc, cdtype,
        )
        dacts_scr[:] += din_p[:, wd:]

        # ---- masked block (x side dropped: stop-grad) --------------------
        din_m = _sub_bwd(
            w, dw, "m", jnp.concatenate([x, macts], axis=-1),
            saves["mh1"][:], saves["mh2"][:], saves["mh3"][:],
            gmask_ref[:].astype(f32), cfg, rc, cdtype,
        )
        dmacts_scr[:] += din_m[:, wd:]

        # ---- prior block (head cotangent ext., tail cotangent du) --------
        dh4_q = jnp.concatenate([gprior_ref[:].astype(f32), du], axis=-1)
        din_q = _sub_bwd(
            w, dw, "q", x, saves["qh1"][:], saves["qh2"][:],
            saves["qh3"][:], dh4_q, cfg, rc, cdtype,
        )

        dx = du + din_p[:, :wd] + din_q

        d_scr[:] = dx

        @pl.when(j == L - 1)
        def _flush():
            dx0_ref[:] = dx
            dacts_ref[:] = dacts_scr[:]
            dmacts_ref[:] = dmacts_scr[:]

    return kernel


def _compiler_params():
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024,
    )


@functools.lru_cache(maxsize=64)
def _build_dec_chain(cfg: DecChainConfig, batch: int, L: int):
    """Builds the custom_vjp'd decoder run for one static config.

    Returned callable::

        fn(x0, acts, macts, eps_s, *weight_stacks)
            -> (x_final, post_s, prior_s, mask_s)

    with x0/acts/macts flat ``[batch*h*w, cols]``, eps_s
    ``[L*batch*h*w, ld]`` (level-major), weights ``[L, rows, cols]`` stacks
    in :func:`weight_shapes` order, and the semantic outputs level-major
    ``[L*batch*h*w, cols]``.
    """
    hw = cfg.h * cfg.w
    cdtype = jnp.dtype(cfg.cdtype)
    wshapes = weight_shapes(cfg)
    wnames = [n for n, _ in wshapes]
    shp = dict(wshapes)
    ncf = batch // cfg.bc_fwd
    ncb = batch // cfg.bc_bwd
    two_ld = 2 * cfg.ld
    mw = cfg.ld + cfg.tril

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
        rows, cols = shp[name]
        return pl.BlockSpec((L, rows, cols), lambda i, l: (0, 0, 0))

    fwd_kernel = _fwd_kernel_factory(cfg, L)
    bwd_kernel = _bwd_kernel_factory(cfg, L)

    # save streams: (name, cols, dtype)
    save_defs = [("xout", cfg.width, f32)] + [
        (n, cfg.mid, cdtype) for n in _SAVE_NAMES
    ]

    def fwd_call(x0, acts, macts, eps_s, weights_s):
        bc = cfg.bc_fwd
        in_specs = [
            chunk_spec(bc, cfg.width),
            chunk_spec(bc, cfg.awidth),
            chunk_spec(bc, cfg.awidth),
            lvl_spec(bc, cfg.ld, ncf),
        ]
        args = [x0, acts, macts, eps_s]
        for n in wnames:
            in_specs.append(w_spec(n))
            args.append(weights_s[n])
        out_specs = [
            lvl_spec(bc, cfg.width, ncf),     # xout saves
            lvl_spec(bc, two_ld, ncf),        # posterior c4 out
            lvl_spec(bc, two_ld, ncf),        # prior head
            lvl_spec(bc, mw, ncf),            # masked raw params
        ]
        out_shape = [
            jax.ShapeDtypeStruct((L * batch * hw, cfg.width), f32),
            jax.ShapeDtypeStruct((L * batch * hw, two_ld), f32),
            jax.ShapeDtypeStruct((L * batch * hw, two_ld), f32),
            jax.ShapeDtypeStruct((L * batch * hw, mw), f32),
        ]
        for n, cols, dt in save_defs[1:]:
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
            scratch_shapes=[pltpu.VMEM((bc * hw, cfg.width), f32)],
            interpret=cfg.interpret,
            compiler_params=_compiler_params(),
        )(*args)

    def xprev_spec(bc, nc):
        return pl.BlockSpec(
            (bc * hw, cfg.width),
            lambda i, l: (jnp.maximum(L - 2 - l, 0) * nc + i, 0),
        )

    def bwd_call(g, gpost, gprior, gmask, x0, acts, macts, eps_s,
                 saves, weights_s):
        bc = cfg.bc_bwd
        xout = saves[0]
        in_specs = [
            chunk_spec(bc, cfg.width),        # g (final-x cotangent)
            lvl_spec(bc, two_ld, ncb, rev=True),
            lvl_spec(bc, two_ld, ncb, rev=True),
            lvl_spec(bc, mw, ncb, rev=True),
            chunk_spec(bc, cfg.width),        # x0
            xprev_spec(bc, ncb),              # xout[lvl-1]
            chunk_spec(bc, cfg.awidth),
            chunk_spec(bc, cfg.awidth),
            lvl_spec(bc, cfg.ld, ncb, rev=True),
        ]
        args = [g, gpost, gprior, gmask, x0, xout, acts, macts, eps_s]
        for (n, cols, dt), arr in zip(save_defs[1:], saves[1:]):
            in_specs.append(lvl_spec(bc, cols, ncb, rev=True))
            args.append(arr)
        for n in wnames:
            in_specs.append(w_spec(n, rev=True))
            args.append(weights_s[n])
        out_specs = [
            chunk_spec(bc, cfg.width),        # dx0
            chunk_spec(bc, cfg.awidth),       # dacts
            chunk_spec(bc, cfg.awidth),       # dmacts
        ]
        out_shape = [
            jax.ShapeDtypeStruct((batch * hw, cfg.width), f32),
            jax.ShapeDtypeStruct((batch * hw, cfg.awidth), f32),
            jax.ShapeDtypeStruct((batch * hw, cfg.awidth), f32),
        ]
        for n in wnames:
            rows, cols = shp[n]
            out_specs.append(dw_spec(n))
            out_shape.append(jax.ShapeDtypeStruct((L, rows, cols), f32))
        return pl.pallas_call(
            bwd_kernel,
            grid=(ncb, L),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((bc * hw, cfg.width), f32),
                pltpu.VMEM((bc * hw, cfg.awidth), f32),
                pltpu.VMEM((bc * hw, cfg.awidth), f32),
            ],
            interpret=cfg.interpret,
            compiler_params=_compiler_params(),
        )(*args)

    def _outputs(fwd_outs):
        xout, post_s, prior_s, mask_s = fwd_outs[:4]
        x_final = jax.lax.slice_in_dim(
            xout, (L - 1) * batch * hw, L * batch * hw
        )
        return x_final, post_s, prior_s, mask_s

    @jax.custom_vjp
    def chain(*flat):
        x0, acts, macts, eps_s = flat[:4]
        weights_s = dict(zip(wnames, flat[4:]))
        return _outputs(fwd_call(x0, acts, macts, eps_s, weights_s))

    def chain_fwd(*flat):
        x0, acts, macts, eps_s = flat[:4]
        weights_s = dict(zip(wnames, flat[4:]))
        outs = fwd_call(x0, acts, macts, eps_s, weights_s)
        return _outputs(outs), (
            x0, acts, macts, eps_s, outs[:1] + outs[4:], weights_s
        )

    def chain_bwd(res, g):
        x0, acts, macts, eps_s, saves, weights_s = res
        gx, gpost, gprior, gmask = g
        outs = bwd_call(
            gx, gpost, gprior, gmask, x0, acts, macts, eps_s,
            saves, weights_s,
        )
        dx0, dacts, dmacts = outs[:3]
        dws = outs[3:]
        # eps is reparameterization noise — no caller differentiates it
        return (dx0, dacts, dmacts, jnp.zeros_like(eps_s), *dws)

    chain.defvjp(chain_fwd, chain_bwd)
    return chain


def dec_chain(
    x0,
    acts,
    macts,
    eps,                      # [L, B, H, W, ld]
    weights,                  # dict of [L, rows, cols] stacks
    *,
    mid: int,
    ld: int,
    tril: int,
    k: int,
    compute_dtype=jnp.float32,
    bc_fwd: int = 1,
    bc_bwd: int = 1,
    interpret: bool = False,
):
    """Runs L consecutive DecoderBlocks at one resolution as ONE streamed
    fwd kernel + ONE streamed bwd kernel.

    Args:
        x0: ``[B, H, W, width]`` decoder state entering the run (mixin /
            bias prep already applied).
        acts / macts: ``[B, H, W, awidth]`` encoder activations at this
            resolution (broadcast to the batch).
        eps: ``[L, B, H, W, ld]`` reparameterization noise per level.
        weights: stacked kernel-native weights per :func:`weight_shapes`.

    Returns ``(x_final [B,H,W,width], post [L,B,H,W,2ld],
    prior [L,B,H,W,2ld], masked [L,B,H,W,ld+tril])``.
    """
    import os

    bc_fwd = int(os.environ.get("PM_TPU_DEC_BC_FWD", bc_fwd))
    bc_bwd = int(os.environ.get("PM_TPU_DEC_BC_BWD", bc_bwd))

    b, h, w_, wd = x0.shape
    aw = acts.shape[-1]
    L = int(eps.shape[0])
    cdt = jnp.dtype(compute_dtype)
    mod = 16 if cdt.itemsize < 4 else 8
    cfg = DecChainConfig(
        h=h, w=w_, width=wd, awidth=aw, mid=mid, ld=ld, tril=tril, k=k,
        cdtype=cdt.name,
        bc_fwd=_snap_chunk(bc_fwd, b, h * w_, mod),
        bc_bwd=_snap_chunk(bc_bwd, b, h * w_, mod),
        interpret=interpret,
    )
    fn = _build_dec_chain(cfg, b, L)
    shapes = dict(weight_shapes(cfg))
    flat = [
        x0.reshape(b * h * w_, wd).astype(f32),
        jnp.broadcast_to(acts, (b, h, w_, aw)).reshape(
            b * h * w_, aw
        ).astype(f32),
        jnp.broadcast_to(macts, (b, h, w_, aw)).reshape(
            b * h * w_, aw
        ).astype(f32),
        eps.reshape(L * b * h * w_, ld).astype(f32),
    ]
    for n in shapes:
        arr = weights[n]
        exp = (L, *shapes[n])
        if arr.shape != exp:
            raise ValueError(f"{n}: expected {exp}, got {arr.shape}")
        # biases, every c4 and the z path stay f32; w1-w3 ride compute dtype
        keep_f32 = n.endswith(("b1", "b2", "b3", "b4", "w4")) or n in (
            "wz", "bz",
        )
        flat.append(arr.astype(f32) if keep_f32 else arr.astype(cdt))
    x_final, post_s, prior_s, mask_s = fn(*flat)
    shape5 = lambda t, c: t.reshape(L, b, h, w_, c)
    return (
        x_final.reshape(b, h, w_, wd),
        shape5(post_s, 2 * ld),
        shape5(prior_s, 2 * ld),
        shape5(mask_s, ld + tril),
    )


def dec_chain_supported(batch, h, w, compute_dtype=jnp.float32) -> bool:
    mod = 16 if jnp.dtype(compute_dtype).itemsize < 4 else 8
    return (batch * h * w) % mod == 0
