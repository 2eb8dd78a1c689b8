"""Posterior-Matching Very Deep VAE (flax.linen).

TPU-native reimplementation of reference
``posterior_matching/models/vdvae.py``: a hierarchical VAE (in the style of
"Very Deep VAEs Generalize Autoregressive Models...") with a *second* full
masked encoder and a per-decoder-block full-covariance (TriL) masked posterior
trained with ``pm_kl = KL(stop_grad(posterior) || masked_posterior)``
(reference vdvae.py:532-571). Output head is a discretized
mixture-of-logistics with RGB channel coupling.

Architecture stance:

- every conv is NHWC on the MXU; the bottleneck Block is plain composition
  that XLA fuses;
- the four forward modes of the reference's decoder (posterior / partial
  posterior / prior / importance-sampling lls, reference vdvae.py:815-855)
  are module methods over shared submodules; multi-sample loops (is_log_probs,
  impute) live in free functions that ``lax.scan`` over ``model.apply``
  closures so encoder activations are computed once and linen state never
  crosses a jax transform;
- the per-block KL(diag||TriL) uses the closed form from
  :mod:`posterior_matching_tpu.distributions` (no tfp object graphs).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from posterior_matching_tpu.distributions import (
    MultivariateNormalDiag,
    MultivariateNormalTriL,
    QuantizedLogisticMixture,
    fill_scale_tril,
    softplus_scale,
    tril_size,
)
from posterior_matching_tpu.models.networks import _trunc_normal_fan_in
from posterior_matching_tpu.utils import logmeanexp


# ---------------------------------------------------------------------------
# Config-string helpers (same grammar as the reference, vdvae.py:213-239)
# ---------------------------------------------------------------------------


def parse_layer_string(s: str) -> List[Tuple[int, Optional[int]]]:
    """'28x6,28d2,14x4' -> [(res, None/mixin/down), ...]. 'RxN' repeats,
    'RmM' mixes in from resolution M, 'RdD' downsamples by D."""
    layers = []
    for part in s.split(","):
        if "x" in part:
            res, num = part.split("x")
            layers.extend([(int(res), None)] * int(num))
        elif "m" in part:
            res, mixin = part.split("m")
            layers.append((int(res), int(mixin)))
        elif "d" in part:
            res, down = part.split("d")
            layers.append((int(res), int(down)))
        else:
            layers.append((int(part), None))
    return layers


def get_width_settings(width: int, s: Optional[str]):
    mapping = defaultdict(lambda: width)
    if s:
        for part in s.split(","):
            k, v = part.split(":")
            mapping[int(k)] = int(v)
    return mapping


def _conv(out_dim, kernel, name=None, w_init=None, dtype=None):
    return nn.Conv(
        out_dim,
        (kernel, kernel),
        padding="SAME" if kernel > 1 else "VALID",
        kernel_init=w_init or _trunc_normal_fan_in,
        dtype=dtype,
        name=name,
    )


def _zero_conv(out_dim, name=None):
    return nn.Conv(
        out_dim, (1, 1), padding="VALID",
        kernel_init=nn.initializers.zeros, name=name,
    )


def _scaled_init(multiple):
    def init(key, shape, dtype=jnp.float32):
        return _trunc_normal_fan_in(key, shape, dtype) * multiple

    return init


class _ConvParams(nn.Module):
    """Bare kernel+bias params laid out exactly like ``nn.Conv``'s, so the
    param tree (``c{i}/{kernel,bias}``) is identical whichever compute path
    :class:`Block` takes (same trick as models/pixelcnn.py::_ConvParams)."""

    kshape: Tuple[int, ...]
    w_init: Any = None

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", self.w_init or _trunc_normal_fan_in, self.kshape
        )
        bias = self.param("bias", nn.initializers.zeros, (self.kshape[-1],))
        return kernel, bias


class Block(nn.Module):
    """Bottleneck residual block: gelu -> 1x1 -> gelu -> 3x3 -> gelu -> 3x3 ->
    gelu -> 1x1, optional residual add + avg-pool downsample
    (reference vdvae.py:242-284)."""

    middle_width: int
    out_width: int
    down_rate: Optional[int] = None
    residual: bool = False
    use_3x3: bool = True
    zero_last: bool = False
    out_init_multiple: Optional[float] = None
    # Compute dtype for the internal bottleneck convs (c1-c3, where the
    # FLOPs are); the final c4 conv is left at dtype=None so its f32 params
    # promote the block output — and any distribution parameters computed
    # from it — back to float32. Params always stay float32.
    compute_dtype: Optional[str] = None

    def _c4_init(self):
        if self.zero_last:
            return nn.initializers.zeros
        if self.out_init_multiple is not None:
            return _scaled_init(self.out_init_multiple)
        return None  # _trunc_normal_fan_in default

    @nn.compact
    def __call__(self, x, return_weights: bool = False):
        cdtype = (
            jnp.dtype(self.compute_dtype)
            if self.compute_dtype is not None
            else None
        )
        k = 3 if self.use_3x3 else 1
        if return_weights:
            # Creates/returns the identical c1..c4 params without
            # convolving — the fused block-chain kernel consumes them
            # directly while keeping the checkpoint ABI (cf.
            # models/pixelcnn.py::_MaskedConv return_weights).
            m = self.middle_width
            return {
                "c1": _ConvParams((1, 1, x.shape[-1], m), name="c1")(),
                "c2": _ConvParams((k, k, m, m), name="c2")(),
                "c3": _ConvParams((k, k, m, m), name="c3")(),
                "c4": _ConvParams(
                    (1, 1, m, self.out_width), w_init=self._c4_init(),
                    name="c4",
                )(),
            }
        h = _conv(self.middle_width, 1, name="c1", dtype=cdtype)(
            jax.nn.gelu(x)
        )
        h = _conv(self.middle_width, k, name="c2", dtype=cdtype)(
            jax.nn.gelu(h)
        )
        h = _conv(self.middle_width, k, name="c3", dtype=cdtype)(
            jax.nn.gelu(h)
        )
        if self.zero_last:
            h = _zero_conv(self.out_width, name="c4")(jax.nn.gelu(h))
        elif self.out_init_multiple is not None:
            h = _conv(
                self.out_width, 1, name="c4",
                w_init=_scaled_init(self.out_init_multiple),
            )(jax.nn.gelu(h))
        else:
            h = _conv(self.out_width, 1, name="c4")(jax.nn.gelu(h))

        out = x + h if self.residual else h
        if self.down_rate is not None:
            out = nn.avg_pool(
                out,
                (self.down_rate, self.down_rate),
                strides=(self.down_rate, self.down_rate),
                padding="VALID",
            )
        return out


def _pad_channels(t, width):
    d = width - t.shape[-1]
    if d <= 0:
        return t
    return jnp.pad(t, [(0, 0), (0, 0), (0, 0), (0, d)])


class Encoder(nn.Module):
    """Stack of bottleneck blocks recording activations per resolution
    (reference vdvae.py:287-328).

    ``fused_chain``: run each per-resolution RUN of consecutive blocks
    through ONE streamed Pallas kernel per direction
    (ops/block_chain.py) instead of ~4 XLA convs per block. ``None`` =
    auto (on for TPU, opt-out ``PM_TPU_FUSED_CHAIN=0``); ``"interpret"``
    = interpret mode (CPU tests). Param tree and checkpoint ABI are
    identical (weights are sliced/stacked at apply time). Isolated
    blocks (run length 1) stay on XLA — block-granularity pallas calls
    measured a net end-to-end LOSS (ops/gated_block.py header)."""

    width: int
    blocks: str
    bottleneck_multiple: float
    custom_width_string: Optional[str] = None
    remat: bool = False
    compute_dtype: Optional[str] = None
    fused_chain: Optional[Any] = None

    def _fused_mode(self):
        import os

        mode = self.fused_chain
        if mode is None:
            mode = (
                jax.default_backend() == "tpu"
                and os.environ.get("PM_TPU_FUSED_CHAIN") != "0"
            )
        return mode

    @nn.compact
    def __call__(self, x) -> Dict[int, jnp.ndarray]:
        widths = get_width_settings(self.width, self.custom_width_string)
        blocks = parse_layer_string(self.blocks)
        block_cls = nn.remat(Block) if self.remat else Block
        fused = self._fused_mode()

        h = _conv(self.width, 3, name="in_conv")(x)
        activations = {h.shape[1]: h}

        def make_block(i, res, down_rate):
            return block_cls(
                middle_width=int(widths[res] * self.bottleneck_multiple),
                out_width=widths[res],
                down_rate=down_rate,
                residual=True,
                use_3x3=res > 2,
                out_init_multiple=float(np.sqrt(1.0 / len(blocks))),
                compute_dtype=self.compute_dtype,
                name=f"block_{i}",
            )

        i = 0
        while i < len(blocks):
            res, down_rate = blocks[i]
            # maximal run of consecutive NON-downsampling blocks at this
            # resolution; downsampling blocks stay on the unfused path
            # (their pooled output lands at a new resolution, and the
            # pre-pool activation of the run must remain the recorded one)
            j = i
            while (
                j < len(blocks)
                and blocks[j][0] == res
                and blocks[j][1] is None
            ):
                j += 1
            run = blocks[i:j]
            from posterior_matching_tpu.ops.block_chain import (
                block_chain,
                chain_supported,
            )

            cdt = (
                jnp.dtype(self.compute_dtype)
                if self.compute_dtype is not None else jnp.float32
            )
            use_kernel = (
                fused
                and len(run) >= 2
                and h.shape[-1] == widths[res]   # residual width match
                and chain_supported(h.shape[0], h.shape[1], h.shape[2], cdt)
            )
            if use_kernel:

                mid = int(widths[res] * self.bottleneck_multiple)
                k = 3 if res > 2 else 1
                per_level = []
                for off, (r_, dr_) in enumerate(run):
                    wd = make_block(i + off, r_, dr_)(
                        h, return_weights=True
                    )
                    per_level.append({
                        "w1": wd["c1"][0].reshape(-1, mid),
                        "b1": wd["c1"][1].reshape(1, -1),
                        "w2": wd["c2"][0].reshape(-1, mid),
                        "b2": wd["c2"][1].reshape(1, -1),
                        "w3": wd["c3"][0].reshape(-1, mid),
                        "b3": wd["c3"][1].reshape(1, -1),
                        "w4": wd["c4"][0].reshape(mid, -1),
                        "b4": wd["c4"][1].reshape(1, -1),
                    })
                h = block_chain(
                    h, per_level, mid=mid, k=k,
                    compute_dtype=cdt,
                    interpret=(fused == "interpret"),
                )
            elif run:
                for off, (r_, dr_) in enumerate(run):
                    h = make_block(i + off, r_, dr_)(h)
            if not run:                      # a downsampling block
                h = make_block(i, res, down_rate)(h)
                j = i + 1
            cur_res = h.shape[1]
            h = _pad_channels(h, widths[cur_res])
            activations[cur_res] = h
            i = j

        return activations


class LogisticMixtureHead(nn.Module):
    """1x1 conv -> DMoL parameters (reference LogisticMixture,
    vdvae.py:435-476)."""

    num_channels: int
    num_mixtures: int
    low: float = 0.0
    high: float = 255.0

    @nn.compact
    def __call__(self, x) -> QuantizedLogisticMixture:
        c = self.num_channels
        m = self.num_mixtures
        num_coeffs = c * (c - 1) // 2
        num_out = c * 2 + num_coeffs + 1
        params = nn.Conv(
            m * num_out, (1, 1), padding="VALID",
            kernel_init=_trunc_normal_fan_in, name="params_conv",
        )(x)
        params = params.reshape((*x.shape[:-1], m, num_out))

        if c == 1:
            logits, locs, scales = jnp.split(params, 3, axis=-1)
            logits = logits[..., 0]
            coeffs = None
        else:
            logits = params[..., 0]
            locs = params[..., 1 : c + 1]
            scales = params[..., c + 1 : 2 * c + 1]
            coeffs = params[..., -num_coeffs:]
        scales = jax.nn.softplus(scales) + float(np.exp(-7.0))

        return QuantizedLogisticMixture(
            component_logits=logits,
            locs=locs,
            scales=scales,
            coeffs=coeffs,
            low=self.low,
            high=self.high,
            num_channels=c,
        )


class DecoderBlock(nn.Module):
    """One PM decoder block: diag posterior, TriL masked posterior (fed a
    stop-gradient of the decoder state), diag prior + state update, z
    projection, residual resnet (reference PosteriorMatchingDecoderBlock,
    vdvae.py:479-754)."""

    latent_dim: int
    res: int
    mixin: Optional[int]
    num_blocks: int
    width: int
    bottleneck_multiple: float
    custom_width_string: Optional[str] = None
    compute_dtype: Optional[str] = None

    def setup(self):
        widths = get_width_settings(self.width, self.custom_width_string)
        w = widths[self.res]
        self.block_width = w
        use_3x3 = self.res > 2
        mid = int(w * self.bottleneck_multiple)
        ld = self.latent_dim
        cd = self.compute_dtype

        self.posterior_block = Block(
            mid, ld * 2, residual=False, use_3x3=use_3x3,
            compute_dtype=cd, name="posterior",
        )
        self.masked_posterior_block = Block(
            mid, ld + tril_size(ld), residual=False, use_3x3=use_3x3,
            compute_dtype=cd, name="masked_posterior",
        )
        self.prior_block = Block(
            mid, ld * 2 + w, residual=False, use_3x3=use_3x3,
            zero_last=True, compute_dtype=cd, name="prior",
        )
        # z_proj params via _ConvParams (identical tree to the previous
        # nn.Conv: z_proj/{kernel [1,1,ld,w], bias [w]}) so the fused
        # decoder-chain kernel can consume them directly; a 1x1 VALID conv
        # IS the matmul _z_proj applies
        self.z_proj_params = _ConvParams(
            (1, 1, ld, w),
            w_init=_scaled_init(float(np.sqrt(1.0 / self.num_blocks))),
            name="z_proj",
        )
        self.resnet = Block(
            mid, w, residual=True, use_3x3=use_3x3,
            out_init_multiple=float(np.sqrt(1.0 / self.num_blocks)),
            compute_dtype=cd, name="resnet",
        )

    # -- distribution builders ------------------------------------------------

    def _posterior(self, x, acts):
        loc, raw_scale = jnp.split(
            self.posterior_block(jnp.concatenate([x, acts], axis=-1)),
            2, axis=-1,
        )
        return loc, softplus_scale(raw_scale)

    def _masked_posterior(self, x, masked_acts) -> MultivariateNormalTriL:
        params = self.masked_posterior_block(
            jnp.concatenate([x, masked_acts], axis=-1)
        )
        loc = params[..., : self.latent_dim]
        scale_tril = fill_scale_tril(
            params[..., self.latent_dim :], self.latent_dim
        )
        return MultivariateNormalTriL(loc=loc, scale_tril=scale_tril)

    def _prior(self, x):
        out = self.prior_block(x)
        h = out[..., -self.block_width :]
        loc, raw_scale = jnp.split(out[..., : -self.block_width], 2, axis=-1)
        prior = MultivariateNormalDiag(
            loc=loc, scale_diag=softplus_scale(raw_scale)
        )
        return prior, h

    def _get_x(self, xs, batch, like=None):
        if self.res in xs:
            x = xs[self.res]
        elif like is not None:
            x = jnp.zeros_like(like)
        else:
            x = jnp.zeros(
                (batch, self.res, self.res, self.block_width)
            )
        if x.shape[0] != batch:
            x = jnp.broadcast_to(x, (batch, *x.shape[1:]))
        if self.mixin is not None:
            x = x + jax.image.resize(
                xs[self.mixin][..., : x.shape[-1]],
                x.shape,
                jax.image.ResizeMethod.NEAREST,
            )
        return x

    def _z_proj(self, z):
        kernel, bias = self.z_proj_params()
        return z @ kernel.reshape(self.latent_dim, -1) + bias

    def _finish(self, xs, x, z):
        x = x + self._z_proj(z)
        x = self.resnet(x)
        out = dict(xs)
        out[self.res] = x
        return out

    # -- fused decoder-chain hooks (ops/decoder_chain.py) ---------------------

    def sample_rng(self):
        """The block's own "sample" rng — called once per block by the
        fused run so the fold-in path (and every sampled bit) matches the
        unfused ``forward_posterior`` exactly."""
        return self.make_rng("sample")

    def chain_weights(self, awidth: int):
        """Kernel-native weight dict for one fused-run level; creates the
        IDENTICAL param tree via the Blocks' ``return_weights`` path."""
        w = self.block_width
        mid = int(w * self.bottleneck_multiple)

        def conv_dict(tag, block, cin):
            wd = block(jnp.zeros((1, 1, 1, cin)), return_weights=True)
            return {
                f"{tag}_w1": wd["c1"][0].reshape(-1, mid),
                f"{tag}_b1": wd["c1"][1].reshape(1, -1),
                f"{tag}_w2": wd["c2"][0].reshape(-1, mid),
                f"{tag}_b2": wd["c2"][1].reshape(1, -1),
                f"{tag}_w3": wd["c3"][0].reshape(-1, mid),
                f"{tag}_b3": wd["c3"][1].reshape(1, -1),
                f"{tag}_w4": wd["c4"][0].reshape(mid, -1),
                f"{tag}_b4": wd["c4"][1].reshape(1, -1),
            }

        out = {}
        out.update(conv_dict("p", self.posterior_block, w + awidth))
        out.update(conv_dict("m", self.masked_posterior_block, w + awidth))
        out.update(conv_dict("q", self.prior_block, w))
        out.update(conv_dict("r", self.resnet, w))
        zk, zb = self.z_proj_params()
        out["wz"] = zk.reshape(self.latent_dim, -1)
        out["bz"] = zb.reshape(1, -1)
        return out

    @staticmethod
    def _sum_spatial(v):
        return jnp.sum(v, axis=(1, 2))

    # -- the four forward modes -----------------------------------------------

    def forward_posterior(self, xs, activations, masked_activations):
        acts = activations[self.res]
        masked_acts = masked_activations[self.res]
        x = self._get_x(xs, acts.shape[0], like=acts)

        post_loc, post_scale = self._posterior(x, acts)
        posterior = MultivariateNormalDiag(loc=post_loc, scale_diag=post_scale)
        # pm_kl ingredients are returned RAW (unconstrained masked-posterior
        # params + stop-grad diag stats, flattened per position); the Decoder
        # computes ONE batched fill_scale_tril + KL(diag || TriL) over every
        # block's positions — identical math, ~an-order-of-magnitude fewer
        # HLO ops than per-block unrolled solves (29 blocks of tiny tensors
        # pay per-op dispatch 29x; see BASELINE.md).
        masked_params = self.masked_posterior_block(
            jnp.concatenate(
                [jax.lax.stop_gradient(x), masked_acts], axis=-1
            )
        )
        prior, h = self._prior(x)

        x = x + h
        z = posterior.sample(self.make_rng("sample"))
        kl = self._sum_spatial(posterior.kl_divergence(prior))

        batch = post_loc.shape[0]
        flat = lambda t: t.reshape(batch, -1, t.shape[-1])
        pm = dict(
            raw=flat(masked_params),
            loc=flat(jax.lax.stop_gradient(post_loc)),
            scale=flat(jax.lax.stop_gradient(post_scale)),
        )
        return self._finish(xs, x, z), dict(z=z, kl=kl, pm=pm)

    def forward_partial_posterior(self, xs, masked_activations):
        masked_acts = masked_activations[self.res]
        x = self._get_x(xs, masked_acts.shape[0], like=masked_acts)

        masked_posterior = self._masked_posterior(x, masked_acts)
        _, h = self._prior(x)

        x = x + h
        z = masked_posterior.sample(self.make_rng("sample"))
        return self._finish(xs, x, z)

    def forward_prior(self, xs, batch):
        x = self._get_x(xs, batch)
        prior, h = self._prior(x)
        x = x + h
        z = prior.sample(self.make_rng("sample"))
        return self._finish(xs, x, z)

    def forward_lls(self, xs, masked_xs, activations, masked_activations):
        acts = activations[self.res]
        masked_acts = masked_activations[self.res]
        x = self._get_x(xs, acts.shape[0], like=acts)
        masked_x = self._get_x(masked_xs, acts.shape[0], like=acts)

        post_loc, post_scale = self._posterior(x, acts)
        posterior = MultivariateNormalDiag(loc=post_loc, scale_diag=post_scale)
        masked_posterior = self._masked_posterior(masked_x, masked_acts)

        prior, h = self._prior(x)
        masked_prior, masked_h = self._prior(masked_x)

        x = x + h
        masked_x = masked_x + masked_h

        z = posterior.sample(self.make_rng("sample"))
        masked_z = masked_posterior.sample(self.make_rng("sample"))

        stats = dict(
            pz=self._sum_spatial(prior.log_prob(z)),
            qzx=self._sum_spatial(posterior.log_prob(z)),
            masked_pz=self._sum_spatial(masked_prior.log_prob(masked_z)),
            masked_qzx=self._sum_spatial(
                masked_posterior.log_prob(masked_z)
            ),
        )
        return (
            self._finish(xs, x, z),
            self._finish(masked_xs, masked_x, masked_z),
            stats,
        )


class Decoder(nn.Module):
    """The PM decoder: bias inputs per resolution, the block chain, and the
    gain/bias output transform + DMoL head (reference
    PosteriorMatchingDecoder, vdvae.py:757-855)."""

    latent_dim: int
    image_size: int
    num_channels: int
    width: int
    blocks: str
    bottleneck_multiple: float
    no_bias_above: int
    num_mixtures: int
    custom_width_string: Optional[str] = None
    compute_dtype: Optional[str] = None
    # Decoder block-run fusion (ops/decoder_chain.py): None = auto, which
    # is OPT-IN via PM_TPU_FUSED_DECODER=1 on TPU — unlike the encoder
    # chains, the decoder kernels measured NEUTRAL end-to-end at their
    # current chunk tuning (32.6 vs 33.8 steps/s pm_vdvae_mnist bf16,
    # 2026-08-20; the per-grid-step [784, 384]x[384, 48]-class matmuls at
    # bc=1 underfill the MXU), so the measured-winner rule keeps the
    # unfused decoder the default. True/"interpret" force it (tests).
    fused_chain: Optional[Any] = None

    def _fused_mode(self):
        import os

        mode = self.fused_chain
        if mode is None:
            mode = (
                jax.default_backend() == "tpu"
                and os.environ.get("PM_TPU_FUSED_CHAIN") != "0"
                and os.environ.get("PM_TPU_FUSED_DECODER") == "1"
            )
        return mode

    def setup(self):
        widths = get_width_settings(self.width, self.custom_width_string)
        block_specs = parse_layer_string(self.blocks)

        self.dec_blocks = [
            DecoderBlock(
                latent_dim=self.latent_dim,
                res=res,
                mixin=mixin,
                num_blocks=len(block_specs),
                width=self.width,
                bottleneck_multiple=self.bottleneck_multiple,
                custom_width_string=self.custom_width_string,
                compute_dtype=self.compute_dtype,
                name=f"block_{i}",
            )
            for i, (res, mixin) in enumerate(block_specs)
        ]

        resolutions = sorted({res for res, _ in block_specs})
        self.bias_resolutions = [
            r for r in resolutions if r <= self.no_bias_above
        ]
        self.bias_xs = [
            self.param(
                f"x_bias_{r}",
                nn.initializers.zeros,
                (1, r, r, widths[r]),
            )
            for r in self.bias_resolutions
        ]
        self.out_net = LogisticMixtureHead(
            self.num_channels, self.num_mixtures, name="out_net"
        )
        self.gain = self.param(
            "gain", nn.initializers.ones, (1, 1, 1, self.width)
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (1, 1, 1, self.width)
        )

    def _bias_state(self) -> Dict[int, jnp.ndarray]:
        return {r: b for r, b in zip(self.bias_resolutions, self.bias_xs)}

    def _final(self, x):
        return x * self.gain + self.bias

    def _fused_run(self, idxs, xs, activations, masked_activations):
        """Runs consecutive same-resolution DecoderBlocks through ONE
        streamed fwd + ONE bwd kernel (ops/decoder_chain.py); returns the
        updated xs and the per-block stats in the unfused contract."""
        from posterior_matching_tpu.ops.decoder_chain import dec_chain

        blocks = [self.dec_blocks[i] for i in idxs]
        first = blocks[0]
        res = first.res
        acts = activations[res]
        macts = masked_activations[res]
        batch = acts.shape[0]
        ld = self.latent_dim
        x0 = first._get_x(xs, batch, like=acts)
        eps = jnp.stack([
            jax.random.normal(
                b.sample_rng(), (batch, res, res, ld), jnp.float32
            )
            for b in blocks
        ])
        per_level = [b.chain_weights(acts.shape[-1]) for b in blocks]
        weights = {
            n: jnp.stack([lv[n] for lv in per_level]) for n in per_level[0]
        }
        cdt = (
            jnp.dtype(self.compute_dtype)
            if self.compute_dtype is not None else jnp.float32
        )
        x_final, post, prior, mask_raw = dec_chain(
            x0, acts, macts, eps, weights,
            mid=int(first.block_width * self.bottleneck_multiple),
            ld=ld, tril=tril_size(ld), k=3 if res > 2 else 1,
            compute_dtype=cdt,
            interpret=(self._fused_mode() == "interpret"),
        )
        out = dict(xs)
        out[res] = x_final
        stats = []
        flat = lambda t: t.reshape(batch, -1, t.shape[-1])
        for off in range(len(blocks)):
            loc = post[off][..., :ld]
            scale = softplus_scale(post[off][..., ld:])
            posterior = MultivariateNormalDiag(loc=loc, scale_diag=scale)
            pr = MultivariateNormalDiag(
                loc=prior[off][..., :ld],
                scale_diag=softplus_scale(prior[off][..., ld:]),
            )
            kl = DecoderBlock._sum_spatial(posterior.kl_divergence(pr))
            pm = dict(
                raw=flat(mask_raw[off]),
                loc=flat(jax.lax.stop_gradient(loc)),
                scale=flat(jax.lax.stop_gradient(scale)),
            )
            stats.append(dict(kl=kl, pm=pm))
        return out, stats

    def forward_posterior(self, activations, masked_activations):
        from posterior_matching_tpu.ops.decoder_chain import (
            dec_chain_supported,
        )

        xs = self._bias_state()
        stats = []
        specs = parse_layer_string(self.blocks)
        fused = self._fused_mode()
        cdt = (
            jnp.dtype(self.compute_dtype)
            if self.compute_dtype is not None else jnp.float32
        )
        i = 0
        while i < len(specs):
            res, _ = specs[i]
            # maximal run at this resolution (mixin only at the first
            # block, folded into the run's x0 prep by _get_x)
            j = i + 1
            while (
                j < len(specs)
                and specs[j][0] == res
                and specs[j][1] is None
            ):
                j += 1
            batch = activations[res].shape[0]
            if (
                fused
                and j - i >= 2
                and dec_chain_supported(batch, res, res, cdt)
            ):
                xs, run_stats = self._fused_run(
                    list(range(i, j)), xs, activations, masked_activations
                )
                stats.extend(run_stats)
            else:
                for bi in range(i, j):
                    xs, s = self.dec_blocks[bi].forward_posterior(
                        xs, activations, masked_activations
                    )
                    stats.append(s)
            i = j

        # ONE batched pm_kl across every block's positions (see the note in
        # DecoderBlock.forward_posterior), then per-block sums so the stats
        # contract (pm_kl per block, [B]) is unchanged.
        ld = self.latent_dim
        raw = jnp.concatenate([s["pm"]["raw"] for s in stats], axis=1)
        p = MultivariateNormalDiag(
            loc=jnp.concatenate([s["pm"]["loc"] for s in stats], axis=1),
            scale_diag=jnp.concatenate(
                [s["pm"]["scale"] for s in stats], axis=1
            ),
        )
        q = MultivariateNormalTriL(
            loc=raw[..., :ld],
            scale_tril=fill_scale_tril(raw[..., ld:], ld),
        )
        pm_flat = p.kl_divergence(q)  # [B, total positions]
        start = 0
        for s in stats:
            n = s["pm"]["raw"].shape[1]
            s["pm_kl"] = jnp.sum(pm_flat[:, start : start + n], axis=1)
            start += n
            del s["pm"]
        return self._final(xs[self.image_size]), stats

    def forward_partial_posterior(self, masked_activations):
        xs = self._bias_state()
        for block in self.dec_blocks:
            xs = block.forward_partial_posterior(xs, masked_activations)
        return self._final(xs[self.image_size])

    def forward_prior(self, num_samples: int):
        xs = {
            r: jnp.broadcast_to(b, (num_samples, *b.shape[1:]))
            for r, b in self._bias_state().items()
        }
        for block in self.dec_blocks:
            xs = block.forward_prior(xs, num_samples)
        return self._final(xs[self.image_size])

    def forward_lls(self, activations, masked_activations):
        xs = self._bias_state()
        masked_xs = self._bias_state()
        stats = []
        for block in self.dec_blocks:
            xs, masked_xs, s = block.forward_lls(
                xs, masked_xs, activations, masked_activations
            )
            stats.append(s)
        return (
            self._final(xs[self.image_size]),
            self._final(masked_xs[self.image_size]),
            stats,
        )


class PosteriorMatchingVDVAE(nn.Module):
    """Full PM-VDVAE (reference vdvae.py:15-186). Inputs are [0, 255] images;
    encoders see ``x/127.5 - 1`` (reference vdvae.py:77-80)."""

    image_shape: Tuple[int, int, int]
    encoder_blocks: str
    decoder_blocks: str
    latent_dim: int = 16
    width: int = 128
    bottleneck_multiple: float = 0.25
    no_bias_above: int = 64
    num_mixtures: int = 10
    custom_width_string: Optional[str] = None
    # rematerialize encoder blocks in the backward pass (trades FLOPs for
    # HBM on deep stacks; not a reference option)
    remat: bool = False
    # bf16 compute inside the bottleneck blocks; all distribution parameters
    # (posterior/prior locs and scales, TriL factors, DMoL params) stay f32
    compute_dtype: Optional[str] = None
    # Encoder block-run fusion (ops/block_chain.py): None = auto (TPU on),
    # False = off, "interpret" = interpret-mode kernels (CPU tests)
    fused_chain: Optional[Any] = None

    @classmethod
    def from_config(cls, config: Dict[str, Any], name: Optional[str] = None):
        cfg = dict(config)
        cfg["image_shape"] = tuple(cfg["image_shape"])
        return cls(**cfg, name=name)

    def setup(self):
        self.encoder = Encoder(
            self.width, self.encoder_blocks, self.bottleneck_multiple,
            self.custom_width_string, remat=self.remat,
            compute_dtype=self.compute_dtype,
            fused_chain=self.fused_chain, name="encoder",
        )
        self.masked_encoder = Encoder(
            self.width, self.encoder_blocks, self.bottleneck_multiple,
            self.custom_width_string, remat=self.remat,
            compute_dtype=self.compute_dtype,
            fused_chain=self.fused_chain, name="masked_encoder",
        )
        self.decoder = Decoder(
            latent_dim=self.latent_dim,
            image_size=self.image_shape[0],
            num_channels=self.image_shape[-1],
            width=self.width,
            blocks=self.decoder_blocks,
            bottleneck_multiple=self.bottleneck_multiple,
            no_bias_above=self.no_bias_above,
            num_mixtures=self.num_mixtures,
            custom_width_string=self.custom_width_string,
            compute_dtype=self.compute_dtype,
            fused_chain=self.fused_chain,
            name="decoder",
        )

    # -- encoders --------------------------------------------------------------

    def encode_pair(self, x, b):
        scaled = x / 127.5 - 1.0
        activations = self.encoder(scaled)
        masked_activations = self.masked_encoder(
            jnp.concatenate([scaled * b, b], axis=-1)
        )
        return activations, masked_activations

    def encode_masked(self, x, b):
        scaled = x / 127.5 - 1.0
        return self.masked_encoder(
            jnp.concatenate([scaled * b, b], axis=-1)
        )

    # -- single-pass forward modes ----------------------------------------------

    def __call__(self, x: jnp.ndarray, b: jnp.ndarray) -> Dict[str, Any]:
        activations, masked_activations = self.encode_pair(x, b)
        px_z, stats = self.decoder.forward_posterior(
            activations, masked_activations
        )
        dist = self.decoder.out_net(px_z)
        return {
            "reconstruction_ll": dist.log_prob(x),
            "kl": sum(s["kl"] for s in stats),
            "pm_kl": sum(s["pm_kl"] for s in stats),
            "reconstruction": dist.mean(),
        }

    def decode_lls_once(self, x, b, activations, masked_activations):
        """One importance sample of (log p-hat(x), log p-hat(x_o))
        (reference sample_fn inside is_log_probs, vdvae.py:117-138)."""
        px_z, pxo_z, stats = self.decoder.forward_lls(
            activations, masked_activations
        )
        px_dist = self.decoder.out_net(px_z)
        pxo_dist = self.decoder.out_net(pxo_z)

        pxz_ll = px_dist.log_prob(x)
        per_pixel = pxo_dist.log_prob(x, independent=False)
        pxoz_ll = jnp.sum(
            per_pixel[..., None] * b, axis=tuple(range(1, b.ndim))
        )

        pz = sum(s["pz"] for s in stats)
        qzx = sum(s["qzx"] for s in stats)
        masked_pz = sum(s["masked_pz"] for s in stats)
        masked_qzx = sum(s["masked_qzx"] for s in stats)

        return pxz_ll + pz - qzx, pxoz_ll + masked_pz - masked_qzx

    def impute_once(self, x, b, masked_activations):
        """One stitched imputation (reference _impute_single,
        vdvae.py:174-183)."""
        px_z = self.decoder.forward_partial_posterior(masked_activations)
        dist = self.decoder.out_net(px_z)
        return jnp.where(b == 1, x, dist.mean())

    def sample(self, num_samples: int) -> jnp.ndarray:
        """Unconditional samples (reference vdvae.py:148-159)."""
        px_z = self.decoder.forward_prior(num_samples)
        return self.decoder.out_net(px_z).mean()


# ---------------------------------------------------------------------------
# Multi-sample drivers (free functions over apply closures)
# ---------------------------------------------------------------------------


def _is_log_probs_full(model, variables, x, b, key, num_samples):
    """One unchunked IS pass: encoders ONCE, decoder chain scanned
    ``num_samples`` times."""
    acts, masked_acts = model.apply(
        variables, x, b, method=model.encode_pair
    )

    def body(carry, k):
        px, pxo = model.apply(
            variables, x, b, acts, masked_acts,
            method=model.decode_lls_once, rngs={"sample": k},
        )
        return carry, (px, pxo)

    _, (px, pxo) = jax.lax.scan(
        body, None, jax.random.split(key, num_samples)
    )
    px = logmeanexp(px, axis=0)
    pxo = logmeanexp(pxo, axis=0)
    return px, px - pxo


def vdvae_is_log_probs(
    model: PosteriorMatchingVDVAE,
    variables,
    x: jnp.ndarray,
    b: jnp.ndarray,
    key: jax.Array,
    num_samples: int = 100,
    batch_chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Importance-sampled log p(x) and log p(x_u|x_o) (reference
    is_log_probs, vdvae.py:96-146).

    ``batch_chunk`` bounds peak memory: the batch is processed in
    ``lax.map``-sequenced chunks of that many instances, so the reference's
    625-per-core eval batch (reference eval_pm_vdvae_likelihood.py:43-46)
    fits on a single chip — the per-block TriL chains materialize
    ``[chunk, res, res, k, k]`` intermediates instead of the full batch's.
    Chunking re-splits the PRNG key (one subkey per chunk), so estimates
    match the unchunked path in distribution; they are bitwise equal only
    when ``batch_chunk >= B``.
    """
    n = x.shape[0]
    if batch_chunk is None or n <= batch_chunk:
        return _is_log_probs_full(model, variables, x, b, key, num_samples)

    pad = (-n) % batch_chunk
    if pad:
        x = jnp.concatenate([x, x[:pad]], axis=0)
        b = jnp.concatenate([b, b[:pad]], axis=0)
    chunks = x.shape[0] // batch_chunk
    xs = x.reshape(chunks, batch_chunk, *x.shape[1:])
    bs = b.reshape(chunks, batch_chunk, *b.shape[1:])
    keys = jax.random.split(key, chunks)

    def one(args):
        xc, bc, kc = args
        return _is_log_probs_full(model, variables, xc, bc, kc, num_samples)

    px, ac = jax.lax.map(one, (xs, bs, keys))
    return px.reshape(-1)[:n], ac.reshape(-1)[:n]


def vdvae_impute(
    model: PosteriorMatchingVDVAE,
    variables,
    x: jnp.ndarray,
    b: jnp.ndarray,
    key: jax.Array,
    num_samples: int = 100,
) -> jnp.ndarray:
    """[B, num_samples, H, W, C] stitched imputations (reference impute,
    vdvae.py:161-186)."""
    masked_acts = model.apply(variables, x, b, method=model.encode_masked)

    def body(carry, k):
        imputed = model.apply(
            variables, x, b, masked_acts,
            method=model.impute_once, rngs={"sample": k},
        )
        return carry, imputed

    _, imputations = jax.lax.scan(
        body, None, jax.random.split(key, num_samples)
    )
    return jnp.moveaxis(imputations, 0, 1)
