"""Conditional gated PixelCNN over discrete code grids (flax.linen).

TPU-native reimplementation of the reference's PixelCNN distribution
(reference ``posterior_matching/models/pixel_cnn.py``, itself a JAX rewrite of
tfp's PixelCNN++): an embedding of integer code indices feeds masked
vertical/horizontal conv stacks with sigmoid gating, an up/down hierarchy with
skip connections, and a per-pixel Categorical over ``num_indices``.

Key departures from the reference:

- masked convolutions use flax's built-in kernel ``mask`` (the reference
  subclasses haiku's ConvND to multiply the kernel, reference
  pixel_cnn.py:148-211);
- ``log_prob`` is a plain method on the module (teacher-forced, one forward);
- raster-scan sampling lives in :func:`pixelcnn_sample`, a free function over
  an ``apply``-style logits closure, batched over samples x batch in ONE
  network call per pixel (the reference vmaps per-conditional fori_loops,
  reference pixel_cnn.py:102-123 — smaller matmuls per step).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from posterior_matching_tpu.models.networks import _trunc_normal_fan_in


def concat_elu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.elu(jnp.concatenate([x, -x], axis=-1))


def _kernel_mask(kernel_size, valid_rows, valid_cols):
    """[kh, kw, 1, 1] 0/1 mask with ones on [rows)x[cols) (reference
    pixel_cnn.py:556-562)."""
    mask = np.zeros(kernel_size, np.float32)
    mask[valid_rows[0] : valid_rows[1], valid_cols[0] : valid_cols[1]] = 1.0
    return mask[:, :, None, None]


class _ConvParams(nn.Module):
    """Bare kernel+bias params laid out exactly like ``nn.Conv``'s, so the
    param tree (``.../Conv_0/{kernel,bias}``) is identical whichever compute
    path :class:`_MaskedConv` takes."""

    kshape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", _trunc_normal_fan_in, self.kshape)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.kshape[-1],)
        )
        return kernel, bias


class _DenseParams(nn.Module):
    """Bare kernel+bias params laid out exactly like ``nn.Dense``'s (param
    names ``kernel``/``bias`` directly under this module's scope) for the
    fused gated block."""

    kshape: Tuple[int, int]
    kernel_init: Any

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init, self.kshape)
        bias = self.param("bias", nn.initializers.zeros, (self.kshape[-1],))
        return kernel, bias


class _MaskedConv(nn.Module):
    """Causality-masked conv.

    The reference multiplies a 0/1 mask into the kernel and convolves with
    the FULL window (reference pixel_cnn.py:148-211) — every masked tap still
    costs MXU work. Here, for the hot stride-1 odd-kernel case, the kernel is
    statically SLICED to its valid region and convolved with explicit
    (possibly negative) padding: bit-equivalent output (the dropped taps are
    exact zeros), 33-56% fewer conv FLOPs (a (3,3) kernel masked to its top
    2x2 does 4/9 of the work). Strided/even-kernel cases (hierarchy
    down-sampling only) keep the masked full-window conv.
    """

    features: int
    kernel_size: Tuple[int, int]
    valid_rows: Tuple[int, int]
    valid_cols: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, return_weights: bool = False):
        """``return_weights=True`` creates/returns the identical ``Conv_0``
        params (kernel, bias) without convolving — the fused Pallas gated
        block consumes them directly while keeping the checkpoint ABI."""
        kh, kw = self.kernel_size
        (r0, r1), (c0, c1) = self.valid_rows, self.valid_cols
        if return_weights:
            if self.strides != (1, 1) or kh % 2 == 0 or kw % 2 == 0:
                raise ValueError(
                    "return_weights is only for the stride-1 odd-kernel path"
                )
            return _ConvParams(
                (kh, kw, x.shape[-1], self.features), name="Conv_0"
            )()
        if self.strides != (1, 1) or kh % 2 == 0 or kw % 2 == 0:
            mask = jnp.broadcast_to(
                jnp.asarray(
                    _kernel_mask(
                        self.kernel_size, self.valid_rows, self.valid_cols
                    )
                ),
                (kh, kw, x.shape[-1], self.features),
            )
            return nn.Conv(
                self.features,
                self.kernel_size,
                strides=self.strides,
                padding="SAME",
                mask=mask,
                kernel_init=_trunc_normal_fan_in,
                dtype=self.dtype,
                name="Conv_0",
            )(x)

        # An empty valid region would silently build a zero-size conv with a
        # confusing XLA error; the masked branch above degrades to an
        # all-zero conv instead. Neither is ever intended — fail loudly.
        if r1 <= r0 or c1 <= c0:
            raise ValueError(
                f"_MaskedConv valid region is empty: rows [{r0}, {r1}), "
                f"cols [{c0}, {c1}) for kernel {self.kernel_size}"
            )
        kernel, bias = _ConvParams(
            (kh, kw, x.shape[-1], self.features), name="Conv_0"
        )()
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        # SAME padding for a stride-1 odd kernel is (k//2, k//2); keeping
        # only taps [v0, v1) shifts that to (k//2 - v0, (v1-1) - k//2) —
        # negative high padding crops, exactly mirroring the dropped taps.
        out = jax.lax.conv_general_dilated(
            x,
            kernel[r0:r1, c0:c1],
            window_strides=(1, 1),
            padding=(
                (kh // 2 - r0, (r1 - 1) - kh // 2),
                (kw // 2 - c0, (c1 - 1) - kw // 2),
            ),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias


class _MaskedConvTranspose(nn.Module):
    features: int
    kernel_size: Tuple[int, int]
    valid_rows: Tuple[int, int]
    valid_cols: Tuple[int, int]
    strides: Tuple[int, int] = (2, 2)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        mask = jnp.broadcast_to(
            jnp.asarray(
                _kernel_mask(self.kernel_size, self.valid_rows, self.valid_cols)
            ),
            (kh, kw, x.shape[-1], self.features),
        )
        return nn.ConvTranspose(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding="SAME",
            mask=mask,
            kernel_init=_trunc_normal_fan_in,
            dtype=self.dtype,
        )(x)


class PixelCNN(nn.Module):
    """The network; ``__call__`` maps an integer code grid (+ conditioning
    vector) to per-pixel categorical logits.

    Attributes mirror the reference constructor (reference pixel_cnn.py:27-47).
    """

    num_indices: int
    image_shape: Tuple[int, int]
    dropout: float = 0.5
    num_resnet: int = 15
    num_hierarchies: int = 1
    num_filters: int = 128
    receptive_field_dims: Tuple[int, int] = (3, 3)
    # Compute dtype for the conv/dense stacks (params stay float32); set to
    # "bfloat16" to run the masked convs on the MXU at bf16 throughput.
    # Logits/log_softmax are always evaluated in float32.
    dtype: Optional[str] = None
    # Fused gated-PAIR chain (ops/gated_chain.py): the whole 2*num_resnet
    # block chain runs as Pallas segment kernels (fwd + custom VJP), dropout
    # generated in-kernel. None = auto (on TPU unless PM_TPU_FUSED_CHAIN=0),
    # True/False = force, "interpret" = Pallas interpreter with injected
    # masks (CPU tests). Checkpoints identical. (The earlier per-BLOCK
    # Pallas kernel was retired round 3: numerics exact but a measured
    # end-to-end loser — pallas_call boundaries at block granularity block
    # XLA's cross-op fusion, 55.3 vs 69.5 steps/s; the chain/segment
    # kernels subsume it.)
    fused_chain: Optional[Any] = None

    @property
    def _cdtype(self):
        return jnp.dtype(self.dtype) if self.dtype is not None else None

    def _use_fused_chain(self, conditional_input) -> bool:
        """Whether to run the resnet chain through the Pallas segment/pair
        kernels (ops/gated_chain.py). Requires a flat (no hierarchy)
        topology, a conditional input, and a sliceable tap geometry (every
        shipped PM-VQVAE config qualifies)."""
        import os

        if self.num_hierarchies != 1 or conditional_input is None:
            return False
        mode = self.fused_chain
        if mode is None:
            # Default ON for TPU (opt-out PM_TPU_FUSED_CHAIN=0): validated
            # on-chip round 3 — logits 1.1e-6, grads 5.6e-5 vs the unfused
            # path at highest precision, PRNG dropout bit-deterministic
            # (datasets/validate_chain_tpu.py).
            mode = (
                jax.default_backend() == "tpu"
                and os.environ.get("PM_TPU_FUSED_CHAIN") != "0"
            )
        if not mode:
            return False
        from posterior_matching_tpu.ops.gated_block import plan_taps

        rows, cols = self.receptive_field_dims
        try:
            plan_taps((2 * rows - 3, cols), (0, rows - 1), (0, cols))
            plan_taps((3, cols), (0, 2), (0, cols // 2 + 1))
        except ValueError:
            return False
        return True

    def _chain_block_params(self, tag, kernel_size, constraint, aux_in,
                            cond_dim):
        """Creates one gated block's params with the EXACT names/shapes/inits
        of the unfused path and returns them packed for the pair kernel:
        sliced+flattened conv kernels, folded biases, split aux weights."""
        f = self.num_filters
        (r0, r1), (c0, c1) = constraint
        token = jnp.zeros((1, 1, 1, 2 * f))  # channel-count carrier only
        wa, ba = _MaskedConv(
            f, kernel_size, *constraint, dtype=self._cdtype,
            name=f"{tag}_conv_a",
        )(token, return_weights=True)
        wb, bb = _MaskedConv(
            2 * f, kernel_size, *constraint, dtype=self._cdtype,
            name=f"{tag}_conv_b",
        )(token, return_weights=True)
        wc, bc_ = _DenseParams(
            (cond_dim, 2 * f), nn.initializers.normal(1.0),
            name=f"{tag}_cond_proj",
        )()
        out = {
            "wa": wa[r0:r1, c0:c1].reshape(-1, f),
            "wb": wb[r0:r1, c0:c1].reshape(-1, 2 * f),
            "wc": wc,
            "ba": ba.reshape(1, f),
            "bb": (bb + bc_).reshape(1, 2 * f),  # cond bias folds into bb
        }
        if aux_in:
            waux, baux = _DenseParams(
                (2 * aux_in, f), _trunc_normal_fan_in, name=f"{tag}_aux"
            )()
            out["ba"] = out["ba"] + baux.reshape(1, f)  # aux bias folds
            out["waux"] = waux
        return out

    def _fused_chain(self, stacks_init, cond, training, packed=None):
        """Runs the 2*num_resnet gated-block chain through the pair kernels.

        Equivalent to the unfused up+down loops of ``__call__`` for
        ``num_hierarchies == 1``: up pairs (vertical; horizontal with the
        new vertical as aux), then down pairs consuming the up outputs in
        reverse as skips (reference pixel_cnn.py:372-553 wiring). JAX
        autodiff routes the pair kernels' dskip cotangents back through
        the saved up outputs, so the skip gradient plumbing is implicit.
        """
        import os

        from posterior_matching_tpu.ops.gated_chain import (
            gated_pair,
            gated_segment,
            gated_stream,
        )

        f = self.num_filters
        n = self.num_resnet
        b = stacks_init["vertical"].shape[0]
        cond2d = cond.reshape((cond.shape[0], -1))
        cond_dim = cond2d.shape[-1]

        rows, cols = self.receptive_field_dims
        ksizes = {
            "vertical": (2 * rows - 3, cols),
            "horizontal": (3, cols),
        }
        constraints = {
            "vertical": ((0, rows - 1), (0, cols)),
            "horizontal": ((0, 2), (0, cols // 2 + 1)),
        }

        interpret = self.fused_chain == "interpret"
        keep = 1.0 - self.dropout if (training and self.dropout > 0) else 1.0
        mask_mode = (
            "prng"
            if (jax.default_backend() == "tpu" and not interpret)
            else "input"
        )
        common = dict(
            keep=keep,
            compute_dtype=self._cdtype or jnp.float32,
            bc_fwd=int(os.environ.get("PM_TPU_CHAIN_BC_FWD", "4")),
            # bwd chunk 4 over 2: +1.3% end-to-end on the packed flagship
            # step (87.9 vs 86.7 steps/s, same-session A/B 2026-08-20);
            # the round-3 (4,2) sweep predates the packed/stream path
            bc_bwd=int(os.environ.get("PM_TPU_CHAIN_BC_BWD", "4")),
            mask_mode=mask_mode,
            interpret=interpret,
            receptive_field_dims=self.receptive_field_dims,
        )

        if keep < 1.0:
            seed = jax.random.randint(
                self.make_rng("dropout"), (), 0,
                jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
            )
        else:
            seed = jnp.zeros((), jnp.int32)

        def masks_for(shape):
            if keep >= 1.0 or mask_mode != "input":
                return None
            mk1, mk2 = jax.random.split(self.make_rng("dropout"))
            m = lambda k: jax.random.bernoulli(
                k, keep, (*shape[:-1], 2 * f)
            ).astype(jnp.float32)
            return (m(mk1), m(mk2))

        def pack_pair(prefix, p, down):
            pv = self._chain_block_params(
                f"{prefix}_0_{p}_vertical", ksizes["vertical"],
                constraints["vertical"], aux_in=f if down else 0,
                cond_dim=cond_dim,
            )
            ph = self._chain_block_params(
                f"{prefix}_0_{p}_horizontal", ksizes["horizontal"],
                constraints["horizontal"], aux_in=2 * f if down else f,
                cond_dim=cond_dim,
            )
            w = {
                "wav": pv["wa"], "bav": pv["ba"], "wbv": pv["wb"],
                "bbv": pv["bb"], "wcv": pv["wc"],
                "wah": ph["wa"], "bah": ph["ba"], "wbh": ph["wb"],
                "bbh": ph["bb"], "wch": ph["wc"],
            }
            if down:
                w["wxv"] = pv["waux"]
                # concat_elu(concat(u, s)) layout is [elu u, elu s,
                # -u, -s]: split the 4F aux Dense into the u/s halves
                wx = ph["waux"]
                w["wxh_u"] = jnp.concatenate([wx[:f], wx[2 * f : 3 * f]])
                w["wxh_s"] = jnp.concatenate([wx[f : 2 * f], wx[3 * f :]])
            else:
                w["wxh_u"] = ph["waux"]
            return w

        xv = stacks_init["vertical"]
        xh = stacks_init["horizontal"]
        xs_v, xs_h = [xv], [xh]

        # PM_TPU_CHAIN_SEGMENT selects the chain kernel granularity.
        # Default "stream" (the measured winner, 78.2 vs 75.2 steps/s
        # flagship end-to-end): the streamed (level, chunk)-grid kernels —
        # ONE kernel per direction with per-level weights streamed by the
        # level grid index and the xv/xh carry in VMEM scratch — pair-sized
        # working set with 1/12th the launches
        # (ops/gated_chain.py::gated_stream); on-chip validated (fwd
        # 1.1e-6, grads 5.6e-5 at highest precision, PRNG dropout
        # bit-deterministic, datasets/validate_chain_tpu.py).
        # Integer L = segment kernels running L levels back-to-back per
        # launch (L=1 -> pair kernels, the previous default). At float32
        # compute the three modes are numerically identical with identical
        # dropout bits (parity-tested, incl. a bfloat16 tolerance case); at
        # bfloat16 compute they agree to bf16 tolerance only — the modes
        # keep their inter-level carries at different precisions (stream
        # bwd: compute dtype; segment: f32 within a launch; pair: rounded
        # per boundary). The
        # L=4 body holds ~65 MB of live VMEM which starves Mosaic's grid
        # double-buffering: measured END-TO-END 67.9 (L=4) vs 75.2 (pairs)
        # vs 78.2 (stream) steps/s on the flagship (BASELINE.md round-3).
        seg_env = os.environ.get("PM_TPU_CHAIN_SEGMENT", "stream")
        if packed is not None and seg_env != "stream":
            raise ValueError(
                "packed_chain requires the stream chain kernels "
                "(PM_TPU_CHAIN_SEGMENT=stream)"
            )
        if seg_env == "stream":
            def stream_masks():
                # same per-level RNG consumption order as the pair path
                ms = [masks_for(xv.shape) for _ in range(n)]
                return ms if ms[0] is not None else None

            up_w = (
                fold_packed_biases(packed["up"], down=False)
                if packed is not None
                else [pack_pair("up", p, False) for p in range(n)]
            )
            up_outs = gated_stream(
                xv, xh, None, cond2d, up_w,
                seed, 0, masks=stream_masks(), **common,
            )
            xs_v += [o[0] for o in up_outs]
            xs_h += [o[1] for o in up_outs]
            xv, xh = up_outs[-1]
            dn_w = (
                fold_packed_biases(packed["dn"], down=True)
                if packed is not None
                else [pack_pair("dn", p, True) for p in range(n)]
            )
            dn_outs = gated_stream(
                xv, xh,
                [(xs_v[n - 1 - p], xs_h[n - 1 - p]) for p in range(n)],
                cond2d, dn_w,
                seed, n, masks=stream_masks(), **common,
            )
            return dn_outs[-1][1]
        seg_sz = max(1, int(seg_env))

        if seg_sz == 1:
            for p in range(n):
                xv, xh = gated_pair(
                    xv, xh, None, cond2d, pack_pair("up", p, False), seed, p,
                    masks=masks_for(xv.shape), **common,
                )
                xs_v.append(xv)
                xs_h.append(xh)
            for p in range(n):
                skv = xs_v[n - 1 - p]
                skh = xs_h[n - 1 - p]
                xv, xh = gated_pair(
                    xv, xh, (skv, skh), cond2d, pack_pair("dn", p, True),
                    seed, n + p, masks=masks_for(xv.shape), **common,
                )
            return xh

        def seg_masks(count):
            ms = [masks_for(xv.shape) for _ in range(count)]
            return ms if ms[0] is not None else None

        p = 0
        while p < n:
            s = min(seg_sz, n - p)
            outs = gated_segment(
                xv, xh, None, cond2d,
                [pack_pair("up", p + i, False) for i in range(s)],
                seed, p, masks=seg_masks(s), **common,
            )
            for xvl, xhl in outs:
                xs_v.append(xvl)
                xs_h.append(xhl)
            xv, xh = outs[-1]
            p += s
        p = 0
        while p < n:
            s = min(seg_sz, n - p)
            outs = gated_segment(
                xv, xh,
                [(xs_v[n - 1 - (p + i)], xs_h[n - 1 - (p + i)])
                 for i in range(s)],
                cond2d,
                [pack_pair("dn", p + i, True) for i in range(s)],
                seed, n + p, masks=seg_masks(s), **common,
            )
            xv, xh = outs[-1]
            p += s
        return xh

    def _gated_residual(
        self, tag, input_x, aux, cond, kernel_size, constraint, training
    ):
        """One gated resnet block: conv -> (+aux cue) -> conv(2F) ->
        (+cond projection) -> sigmoid gate -> residual. All submodules are
        explicitly named (linen auto-numbering would shift when the optional
        branches are skipped).

        On TPU the flat-topology conditional chain runs these blocks through
        the Pallas segment kernels instead (``_fused_chain``) over the SAME
        params — checkpoints are interchangeable between the paths.
        """
        f = self.num_filters

        x = concat_elu(input_x)
        x = _MaskedConv(
            f, kernel_size, *constraint, dtype=self._cdtype,
            name=f"{tag}_conv_a",
        )(x)
        if aux is not None:
            x = x + nn.Dense(
                f, kernel_init=_trunc_normal_fan_in, dtype=self._cdtype,
                name=f"{tag}_aux",
            )(concat_elu(aux))
        x = concat_elu(x)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x = _MaskedConv(
            2 * f, kernel_size, *constraint, dtype=self._cdtype,
            name=f"{tag}_conv_b",
        )(x)
        if cond is not None:
            proj = nn.Dense(
                2 * f, kernel_init=nn.initializers.normal(1.0),
                dtype=self._cdtype, name=f"{tag}_cond_proj",
            )(cond.reshape((cond.shape[0], -1)))
            x = x + proj[:, None, None, :]
        activation, gate = jnp.split(x, 2, axis=-1)
        return input_x + jax.nn.sigmoid(gate) * activation

    @nn.compact
    def __call__(
        self,
        indices: jnp.ndarray,
        conditional_input: Optional[jnp.ndarray] = None,
        training: bool = False,
        packed_chain: Optional[Dict[str, Any]] = None,
    ) -> jnp.ndarray:
        f = self.num_filters
        rows, cols = self.receptive_field_dims

        valid = {
            "vertical": (rows - 1, cols),
            "horizontal": (2, cols // 2 + 1),
        }
        ksizes = {
            "vertical": (2 * rows - 3, cols),
            "horizontal": (3, cols),
        }
        constraints = {
            k: ((0, v[0]), (0, v[1])) for k, v in valid.items()
        }

        h0 = nn.Embed(
            self.num_indices, f, dtype=self._cdtype, name="embed"
        )(indices.astype(jnp.int32))

        v_init = _MaskedConv(
            f, (2 * rows - 1, cols), (0, rows - 1), (0, cols),
            dtype=self._cdtype, name="v_init",
        )(h0)
        h_up = _MaskedConv(
            f, (3, cols), (0, 1), (0, cols), dtype=self._cdtype,
            name="h_init_up",
        )(h0)
        h_left = _MaskedConv(
            f, (3, cols), (0, 2), (0, cols // 2), dtype=self._cdtype,
            name="h_init_left",
        )(h0)

        stacks = {"vertical": [v_init], "horizontal": [h_up + h_left]}

        if packed_chain is not None and not self._use_fused_chain(
            conditional_input
        ):
            raise ValueError(
                "packed_chain was given but the fused chain path is not "
                "active (needs num_hierarchies=1, a conditional input, and "
                "fused_chain enabled)"
            )
        if self._use_fused_chain(conditional_input):
            x_final = self._fused_chain(
                {"vertical": v_init, "horizontal": h_up + h_left},
                conditional_input, training, packed=packed_chain,
            )
            x_out = jax.nn.elu(x_final)
            logits = nn.Conv(
                self.num_indices, (1, 1), kernel_init=_trunc_normal_fan_in,
                name="logits_conv",
            )(x_out)
            return logits.astype(jnp.float32)

        # -- up (downsampling) pass ----------------------------------------
        for i in range(self.num_hierarchies):
            for r in range(self.num_resnet):
                for name in ("vertical", "horizontal"):
                    aux = (
                        stacks["vertical"][-1]
                        if name == "horizontal"
                        else None
                    )
                    out = self._gated_residual(
                        f"up_{i}_{r}_{name}", stacks[name][-1], aux,
                        conditional_input, ksizes[name], constraints[name],
                        training,
                    )
                    stacks[name].append(out)

            if i < self.num_hierarchies - 1:
                for name in ("vertical", "horizontal"):
                    h_, w_ = valid[name]
                    kh = 2 * h_
                    kw = w_ + 1 if name == "vertical" else 2 * w_
                    x = _MaskedConv(
                        f, (kh, kw), (0, h_), (0, w_), strides=(2, 2),
                        dtype=self._cdtype,
                        name=f"down_sample_{i}_{name}",
                    )(stacks[name][-1])
                    stacks[name].append(x)

        down = {k: s.pop() for k, s in stacks.items()}

        # -- down (upsampling) pass ----------------------------------------
        for i in range(self.num_hierarchies):
            n_res = self.num_resnet if i == 0 else self.num_resnet + 1
            for r in range(n_res):
                for name in ("vertical", "horizontal"):
                    skip = stacks[name].pop()
                    if name == "horizontal":
                        skip = jnp.concatenate(
                            [down["vertical"], skip], axis=-1
                        )
                    down[name] = self._gated_residual(
                        f"dn_{i}_{r}_{name}", down[name], skip,
                        conditional_input, ksizes[name], constraints[name],
                        training,
                    )

            if i < self.num_hierarchies - 1:
                for name in ("vertical", "horizontal"):
                    h_, w_ = valid[name]
                    kh = 2 * h_ - 2
                    if name == "vertical":
                        kw = w_ + 1
                        constraint = ((h_ - 2, kh), (0, w_))
                    else:
                        kw = 2 * w_ - 2
                        constraint = ((h_ - 2, kh), (w_ - 2, kw))
                    down[name] = _MaskedConvTranspose(
                        f, (kh, kw), *constraint, dtype=self._cdtype,
                        name=f"up_sample_{i}_{name}",
                    )(down[name])

        x_out = jax.nn.elu(down["horizontal"])
        # logits conv left at dtype=None: f32 params promote the bf16
        # activations back to f32, so the categorical head is always f32.
        logits = nn.Conv(
            self.num_indices, (1, 1), kernel_init=_trunc_normal_fan_in,
            name="logits_conv",
        )(x_out)
        return logits.astype(jnp.float32)

    def log_prob(
        self,
        value: jnp.ndarray,
        conditional_input: Optional[jnp.ndarray] = None,
        training: bool = False,
        packed_chain: Optional[Dict[str, Any]] = None,
    ) -> jnp.ndarray:
        """Teacher-forced log-likelihood, summed over the grid
        (reference pixel_cnn.py:53-63)."""
        logits = self(
            value, conditional_input=conditional_input, training=training,
            packed_chain=packed_chain,
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        lls = jnp.take_along_axis(
            logp, value.astype(jnp.int32)[..., None], axis=-1
        )[..., 0]
        return jnp.sum(lls, axis=tuple(range(1, lls.ndim)))


# ---------------------------------------------------------------------------
# Packed-chain training representation
#
# The fused stream kernels consume per-level weights SLICED to their valid
# taps, flattened, and STACKED along a level axis (ops/gated_chain.py
# ``_weight_shapes``).  The canonical flax param tree stores them per level
# as full conv kernels (checkpoint ABI = the unfused path's).  Re-deriving
# the kernel-native form every step costs ~100 slice/reshape/stack copies,
# and the per-leaf optimizer over ~100 chain leaves fragments into ~300
# small fusions (the measured ~2.8 ms round-3 tail, BASELINE.md).  These
# helpers let the TRAINER keep the chain weights in kernel-native stacked
# form across a steps_per_call scan — Adam runs on ~24 stacked tensors —
# and convert back only at dispatch boundaries:
#
#   packed = pack_chain_params(params["pixel_cnn"], ...)   # per dispatch
#   ... scan: model.apply(..., packed_chain=packed); adam on packed ...
#   params["pixel_cnn"] = unpack_chain_params(packed, params["pixel_cnn"])
#
# NUMERICAL EQUIVALENCE to per-leaf training: pack/unpack are exact
# rearrangements (slice/reshape/stack/row-permutations), and any ELEMENTWISE
# optimizer (adam, sgd, schedules, per-element decay) commutes with them;
# the masked kernel taps receive zero gradient either way, so they stay at
# their init values in both representations.  NOT valid for optimizers with
# cross-leaf coupling that differs per leaf (e.g. per-leaf norm clipping);
# global-norm clipping IS safe (same global norm).  Biases are stored
# UNFOLDED (conv bias, cond bias, aux bias as separate stacked tensors) and
# folded per step by :func:`fold_packed_biases` — a handful of [L,1,C] adds
# — so bias updates match the canonical path exactly.
# ---------------------------------------------------------------------------

_PACKED_BIAS_KEYS = ("bav", "bbv", "bcv", "bxv", "bah", "bbh", "bch", "bxh")


def fold_packed_biases(packed_dir, down: bool):
    """Packed (unfolded) biases -> the kernel-native folded form
    (conv_b bias + cond bias; conv_a bias + aux bias), cf.
    ``_chain_block_params``'s per-level folding."""
    w = {
        k: v for k, v in packed_dir.items() if k not in _PACKED_BIAS_KEYS
    }
    w["bav"] = (
        packed_dir["bav"] + packed_dir["bxv"] if down else packed_dir["bav"]
    )
    w["bah"] = packed_dir["bah"] + packed_dir["bxh"]
    w["bbv"] = packed_dir["bbv"] + packed_dir["bcv"]
    w["bbh"] = packed_dir["bbh"] + packed_dir["bch"]
    return w


def _chain_slices(receptive_field_dims):
    rows, cols = receptive_field_dims
    return {
        "vertical": ((0, rows - 1), (0, cols)),
        "horizontal": ((0, 2), (0, cols // 2 + 1)),
    }


def is_chain_param(key: str) -> bool:
    """Whether a ``pixel_cnn`` param subtree key belongs to the gated-block
    chain (and is therefore covered by the packed representation)."""
    return key.startswith("up_0_") or key.startswith("dn_0_")


def pack_chain_params(
    pc_params: Dict[str, Any],
    *,
    num_resnet: int,
    num_filters: int,
    receptive_field_dims: Tuple[int, int] = (3, 3),
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Canonical ``pixel_cnn`` params -> kernel-native stacked form.

    Returns ``{"up": {...}, "dn": {...}}``; each entry maps the stream
    kernels' weight names to ``[num_resnet, rows, cols]`` stacks (weights
    pre-sliced to valid taps and flattened) with biases kept UNFOLDED (see
    :data:`_PACKED_BIAS_KEYS`).
    """
    f = num_filters
    slc = _chain_slices(receptive_field_dims)
    n = num_resnet

    def conv(tag, stack, which):
        sub = pc_params[f"{tag}_conv_{which}"]["Conv_0"]
        (r0, r1), (c0, c1) = slc[stack]
        k = sub["kernel"][r0:r1, c0:c1]
        return k.reshape(-1, k.shape[-1]), sub["bias"].reshape(1, -1)

    def dense(tag, suffix):
        sub = pc_params[f"{tag}_{suffix}"]
        return sub["kernel"], sub["bias"].reshape(1, -1)

    out = {}
    for d in ("up", "dn"):
        down = d == "dn"
        per_level = []
        for p in range(n):
            tv, th = f"{d}_0_{p}_vertical", f"{d}_0_{p}_horizontal"
            wav, bav = conv(tv, "vertical", "a")
            wbv, bbv = conv(tv, "vertical", "b")
            wcv, bcv = dense(tv, "cond_proj")
            wah, bah = conv(th, "horizontal", "a")
            wbh, bbh = conv(th, "horizontal", "b")
            wch, bch = dense(th, "cond_proj")
            wxh, bxh = dense(th, "aux")
            lvl = {
                "wav": wav, "bav": bav, "wbv": wbv, "bbv": bbv,
                "wcv": wcv, "bcv": bcv,
                "wah": wah, "bah": bah, "wbh": wbh, "bbh": bbh,
                "wch": wch, "bch": bch, "bxh": bxh,
            }
            if down:
                wxv, bxv = dense(tv, "aux")
                lvl["wxv"] = wxv
                lvl["bxv"] = bxv
                # concat_elu(concat(u, s)) = [elu u, elu s, -u, -s]: split
                # the 4F aux Dense into its u/s row halves (pack_pair's
                # layout in ``_fused_chain``).
                lvl["wxh_u"] = jnp.concatenate([wxh[:f], wxh[2 * f: 3 * f]])
                lvl["wxh_s"] = jnp.concatenate([wxh[f: 2 * f], wxh[3 * f:]])
            else:
                lvl["wxh_u"] = wxh
            per_level.append(lvl)
        out[d] = {
            k: jnp.stack([lvl[k] for lvl in per_level])
            for k in per_level[0]
        }
    return out


def unpack_chain_params(
    packed: Dict[str, Dict[str, jnp.ndarray]],
    pc_params: Dict[str, Any],
    *,
    num_resnet: int,
    num_filters: int,
    receptive_field_dims: Tuple[int, int] = (3, 3),
) -> Dict[str, Any]:
    """Inverse of :func:`pack_chain_params`: writes the packed values back
    into (a structural copy of) the canonical param tree.  Kernel taps
    outside the valid region keep their existing (init) values — they get
    zero gradient in both representations."""
    f = num_filters
    slc = _chain_slices(receptive_field_dims)
    pc = jax.tree_util.tree_map(lambda x: x, pc_params)  # fresh containers

    def put_conv(tag, stack, which, k_flat, bias):
        sub = pc[f"{tag}_conv_{which}"]["Conv_0"]
        (r0, r1), (c0, c1) = slc[stack]
        # host-side callers (checkpoint save) hand numpy trees — .at needs jnp
        kern = jnp.asarray(sub["kernel"])
        block = k_flat.reshape(
            r1 - r0, c1 - c0, kern.shape[2], kern.shape[3]
        )
        sub["kernel"] = kern.at[r0:r1, c0:c1].set(block)
        sub["bias"] = bias.reshape(-1)

    def put_dense(tag, suffix, kernel, bias):
        sub = pc[f"{tag}_{suffix}"]
        sub["kernel"] = kernel
        sub["bias"] = bias.reshape(-1)

    for d in ("up", "dn"):
        down = d == "dn"
        pk = packed[d]
        for p in range(num_resnet):
            tv, th = f"{d}_0_{p}_vertical", f"{d}_0_{p}_horizontal"
            put_conv(tv, "vertical", "a", pk["wav"][p], pk["bav"][p])
            put_conv(tv, "vertical", "b", pk["wbv"][p], pk["bbv"][p])
            put_dense(tv, "cond_proj", pk["wcv"][p], pk["bcv"][p])
            put_conv(th, "horizontal", "a", pk["wah"][p], pk["bah"][p])
            put_conv(th, "horizontal", "b", pk["wbh"][p], pk["bbh"][p])
            put_dense(th, "cond_proj", pk["wch"][p], pk["bch"][p])
            if down:
                put_dense(tv, "aux", pk["wxv"][p], pk["bxv"][p])
                u, s = pk["wxh_u"][p], pk["wxh_s"][p]
                wxh = jnp.concatenate([u[:f], s[:f], u[f:], s[f:]])
                put_dense(th, "aux", wxh, pk["bxh"][p])
            else:
                put_dense(th, "aux", pk["wxh_u"][p], pk["bxh"][p])
    return pc


class PackedChainCodec:
    """Param codec for ``Trainer(param_codec=PackedChainCodec.factory(...))``.

    ``encode`` replaces the ``pixel_cnn`` subtree of a canonical param tree
    with ``{"packed": pack_chain_params(...), "rest": <non-chain leaves>}``;
    ``decode`` inverts it. The canonical chain leaves' masked taps (zero
    gradient in both representations) are restored from the INIT-time stub
    captured at construction, so construct the codec AFTER warm-start
    merging. A loss_fn that supports the encoded form applies the model
    with ``packed_chain=params[subtree]["packed"]`` and the stub chain
    leaves merged back for structure (see ``split_encoded``)."""

    def __init__(
        self,
        init_params: Dict[str, Any],
        *,
        num_resnet: int,
        num_filters: int,
        receptive_field_dims: Tuple[int, int] = (3, 3),
        subtree: str = "pixel_cnn",
    ):
        self._kw = dict(
            num_resnet=num_resnet,
            num_filters=num_filters,
            receptive_field_dims=receptive_field_dims,
        )
        self._subtree = subtree
        self.stub = {
            k: v
            for k, v in init_params[subtree].items()
            if is_chain_param(k)
        }

    @classmethod
    def factory(cls, **kwargs) -> Callable[[Dict[str, Any]], "PackedChainCodec"]:
        """``Trainer(param_codec=...)`` factory: called once with the
        initialized (warm-start-merged) params."""
        return lambda init_params: cls(init_params, **kwargs)

    def encode(self, params: Dict[str, Any]) -> Dict[str, Any]:
        pc = params[self._subtree]
        out = {k: v for k, v in params.items() if k != self._subtree}
        out[self._subtree] = {
            "packed": pack_chain_params(pc, **self._kw),
            "rest": {
                k: v for k, v in pc.items() if not is_chain_param(k)
            },
        }
        return out

    def decode(self, params: Dict[str, Any]) -> Dict[str, Any]:
        enc = params[self._subtree]
        pc = unpack_chain_params(
            enc["packed"], {**self.stub, **enc["rest"]}, **self._kw
        )
        out = {k: v for k, v in params.items() if k != self._subtree}
        out[self._subtree] = pc
        return out

    def is_encoded(self, params: Dict[str, Any]) -> bool:
        sub = params.get(self._subtree)
        return isinstance(sub, dict) and "packed" in sub

    def split_encoded(self, params):
        """Encoded tree -> ``(apply_params, packed_chain)``: the canonical
        tree the model can be applied with (stub chain leaves merged back —
        their values are unused by the packed apply path) plus the packed
        weights to pass as ``packed_chain=``."""
        enc = params[self._subtree]
        out = {k: v for k, v in params.items() if k != self._subtree}
        out[self._subtree] = {**self.stub, **enc["rest"]}
        return out, enc["packed"]


def pixelcnn_sample(
    logits_fn: Callable[[jnp.ndarray, Optional[jnp.ndarray]], jnp.ndarray],
    key: jax.Array,
    num_samples: int,
    event_shape: Tuple[int, int],
    conditional_input: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Raster-scan ancestral sampling.

    ``logits_fn(x, cond) -> logits`` is a pure closure over bound params
    (e.g. ``lambda x, c: model.apply(vars, x, c)``). All samples and batch
    elements advance in ONE batched network call per pixel: [S*B, H, W] per
    step (the reference instead vmaps a per-instance fori_loop,
    reference pixel_cnn.py:102-123, giving B small calls per step).

    Returns [num_samples, B, H, W] int32 (or [num_samples, H, W] when
    unconditional with no batch).
    """
    h, w = event_shape
    if conditional_input is not None:
        b = conditional_input.shape[0]
        cond = jnp.broadcast_to(
            conditional_input[None], (num_samples, *conditional_input.shape)
        ).reshape((num_samples * b, -1))
        n_rows = num_samples * b
    else:
        cond = None
        b = None
        n_rows = num_samples

    def body(i, state):
        key, x = state
        key, k = jax.random.split(key)
        logits = logits_fn(x, cond)
        row = i // w
        col = i % w
        # sample only the current pixel's categorical (the rest of the grid's
        # logits are places we haven't reached or won't change)
        pixel_logits = jax.lax.dynamic_slice(
            logits, (0, row, col, 0), (n_rows, 1, 1, logits.shape[-1])
        )[:, 0, 0, :]
        update = jax.random.categorical(k, pixel_logits, axis=-1).astype(
            jnp.int32
        )[:, None, None]
        x = jax.lax.dynamic_update_slice(x, update, (0, row, col))
        return key, x

    init = (key, jnp.zeros((n_rows, h, w), jnp.int32))
    _, samples = jax.lax.fori_loop(0, h * w, body, init)
    if b is not None:
        return samples.reshape((num_samples, b, h, w))
    return samples
