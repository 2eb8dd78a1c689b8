"""Discretized mixture-of-logistics (DMoL) output distribution.

Pure-JAX, fusion-friendly replacement for the reference's
``_LogisticMixtureDist`` (reference ``posterior_matching/models/vdvae.py:331``)
which is built from a stack of tfp wrappers (QuantizedDistribution over a
shifted TransformedDistribution over Logistic, inside MixtureSameFamily inside
Independent). Here the whole quantized-CDF-difference log-likelihood is a
single closed-form expression that XLA fuses into the surrounding convs.

Semantics match the reference exactly:

- ``locs``/``scales``/``coeffs`` are produced in ``[-1, 1]`` space and mapped
  to ``[low, high]``; the quantization shift is -0.5 so bin ``v`` integrates
  the logistic CDF over ``(v-0.5, v+0.5]`` with saturation at the ends.
- with ``num_channels > 1`` the per-channel locations are autoregressively
  coupled through ``coeffs`` and the *actual* values of preceding channels
  (PixelCNN++ RGB coupling, reference vdvae.py:351-369).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from posterior_matching_tpu.distributions._math import sum_rightmost


def _logistic_mean(loc: jnp.ndarray) -> jnp.ndarray:
    return loc


@struct.dataclass
class QuantizedLogisticMixture:
    """DMoL over images shaped ``[..., H, W, C]``.

    Attributes:
        component_logits: ``[..., H, W, M]`` mixture logits.
        locs: ``[..., H, W, M, C]`` component locations in [-1, 1] space.
        scales: ``[..., H, W, M, C]`` positive scales in [-1, 1] space.
        coeffs: ``[..., H, W, M, C*(C-1)//2]`` channel-coupling coefficients,
            or None when ``num_channels == 1``.
        low/high: quantization range (static).
        num_channels: static channel count C.
    """

    component_logits: jnp.ndarray
    locs: jnp.ndarray
    scales: jnp.ndarray
    coeffs: Optional[jnp.ndarray]
    low: float = struct.field(pytree_node=False, default=0.0)
    high: float = struct.field(pytree_node=False, default=255.0)
    num_channels: int = struct.field(pytree_node=False, default=1)

    def _coupled_locs(self, value: jnp.ndarray) -> jnp.ndarray:
        """Applies the autoregressive RGB coupling given actual ``value``."""
        if self.coeffs is None:
            return self.locs
        c = self.num_channels
        # value in [low, high] -> [-1, 1]
        tv = 2.0 * (value - self.low) / (self.high - self.low) - 1.0
        # tv: [..., H, W, C] -> broadcast over mixture axis
        tv = tv[..., None, :]
        locs = [self.locs[..., i] for i in range(c)]
        coef_count = 0
        for i in range(c):
            for j in range(i):
                locs[i] = locs[i] + tv[..., j] * self.coeffs[..., coef_count]
                coef_count += 1
        return jnp.stack(locs, axis=-1)

    def log_prob(
        self, value: jnp.ndarray, independent: bool = True
    ) -> jnp.ndarray:
        """Log-likelihood of integer-valued pixels.

        With ``independent=True`` sums over (H, W), returning ``[...]``;
        otherwise returns per-pixel ``[..., H, W]`` (used for the masked
        observed-only likelihood, reference vdvae.py:125-129).
        """
        locs = self._coupled_locs(value)
        # Map [-1,1]-space parameters to [low, high] pixel space
        locs = self.low + 0.5 * (self.high - self.low) * (locs + 1.0)
        scales = self.scales * 0.5 * (self.high - self.low)

        v = value[..., None, :]
        plus_in = (v + 0.5 - locs) / scales
        minus_in = (v - 0.5 - locs) / scales

        log_cdf_plus = jax.nn.log_sigmoid(plus_in)
        log_sf_minus = jax.nn.log_sigmoid(-minus_in)
        # Middle bins: log(sigmoid(plus) - sigmoid(minus)), clamped for
        # numerical safety (standard PixelCNN++ practice).
        cdf_delta = jax.nn.sigmoid(plus_in) - jax.nn.sigmoid(minus_in)
        mid = jnp.log(jnp.maximum(cdf_delta, 1e-12))

        log_probs = jnp.where(
            v <= self.low,
            log_cdf_plus,
            jnp.where(v >= self.high, log_sf_minus, mid),
        )
        # Independent over channels inside each mixture component.
        log_probs = jnp.sum(log_probs, axis=-1)
        mix_lp = jax.nn.log_softmax(self.component_logits, axis=-1)
        per_pixel = jax.scipy.special.logsumexp(log_probs + mix_lp, axis=-1)
        if independent:
            return sum_rightmost(per_pixel, 2)
        return per_pixel

    def mean(self) -> jnp.ndarray:
        """Mixture-weighted mean with sequential channel coupling, matching
        reference vdvae.py:396-432 (including the [-1,1] clip and rounding)."""
        c = self.num_channels
        weights = jax.nn.softmax(self.component_logits, axis=-1)[..., None]
        mean_locs = jnp.sum(self.locs * weights, axis=-2)

        if self.coeffs is not None:
            mean_coeffs = jnp.sum(self.coeffs * weights, axis=-2)

        channel_means = []
        coef_count = 0
        for i in range(c):
            loc = mean_locs[..., i]
            for prev in channel_means:
                loc = loc + prev * mean_coeffs[..., coef_count]
                coef_count += 1
            channel_means.append(jnp.clip(loc, -1.0, 1.0))

        out = jnp.stack(channel_means, axis=-1)
        out = self.low + 0.5 * (self.high - self.low) * (out + 1.0)
        return jnp.round(out)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        """Draws one sample per batch element (sequential over channels)."""
        k_mix, k_log = jax.random.split(key)
        comp = jax.random.categorical(k_mix, self.component_logits, axis=-1)
        take = lambda p: jnp.take_along_axis(
            p, comp[..., None, None], axis=-3
        )[..., 0, :]
        locs = take(self.locs)
        scales = take(self.scales)
        u = jax.random.uniform(
            k_log, locs.shape, locs.dtype, minval=1e-5, maxval=1.0 - 1e-5
        )
        logistic_noise = jnp.log(u) - jnp.log1p(-u)

        if self.coeffs is None:
            x = jnp.clip(locs + scales * logistic_noise, -1.0, 1.0)
        else:
            coeffs = take(self.coeffs)
            channels = []
            coef_count = 0
            for i in range(self.num_channels):
                loc = locs[..., i]
                for prev in channels:
                    loc = loc + prev * coeffs[..., coef_count]
                    coef_count += 1
                channels.append(
                    jnp.clip(
                        loc + scales[..., i] * logistic_noise[..., i], -1.0, 1.0
                    )
                )
            x = jnp.stack(channels, axis=-1)

        out = self.low + 0.5 * (self.high - self.low) * (x + 1.0)
        return jnp.round(out)
