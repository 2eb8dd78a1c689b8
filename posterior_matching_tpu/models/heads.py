"""Distribution heads: linen modules mapping features -> distribution pytrees.

Functional equivalents of the reference's hk.Module distribution factories
(``posterior_matching/models/distributions.py``). Each head returns one of the
pure-pytree distributions from :mod:`posterior_matching_tpu.distributions`, so
downstream code can carry the returned object through ``vmap``/``scan``/jit
boundaries freely — unlike tfp objects, whose parameters hide inside Python
closures.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from posterior_matching_tpu.distributions import (
    Bernoulli,
    GMM1D,
    MultivariateNormalDiag,
    MultivariateNormalTriL,
    Normal,
    fill_scale_tril,
    softplus_scale,
    tril_size,
)
from posterior_matching_tpu.models.networks import (
    Dense,
    pure_residual_mlp_apply,
    pure_residual_mlp_params,
)


def _flatten(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape((x.shape[0], -1))


class BernoulliHead(nn.Module):
    """Interprets the network output directly as Bernoulli logits
    (reference distributions.py:20-25)."""

    @nn.compact
    def __call__(self, x) -> Bernoulli:
        return Bernoulli(logits=x)


class IdentityGaussianHead(nn.Module):
    """Linear loc head with a single learned scalar log-scale
    (reference distributions.py:28-55)."""

    event_size: int

    @nn.compact
    def __call__(self, x) -> Normal:
        x = _flatten(x)
        loc = Dense(self.event_size)(x)
        log_scale = self.param(
            "log_scale", nn.initializers.zeros, ()
        )
        scale = jnp.broadcast_to(jnp.exp(log_scale), loc.shape)
        return Normal(loc=loc, scale=scale)


class DiagonalGaussianHead(nn.Module):
    """Diagonal MVN head (reference distributions.py:58-84)."""

    event_size: int

    @nn.compact
    def __call__(self, x) -> MultivariateNormalDiag:
        x = _flatten(x)
        params = Dense(self.event_size * 2)(x)
        loc = params[:, : self.event_size]
        scale = softplus_scale(params[:, self.event_size :])
        return MultivariateNormalDiag(loc=loc, scale_diag=scale)


class TriLGaussianHead(nn.Module):
    """Full-covariance MVN head via fill-scale-tril
    (reference distributions.py:87-113)."""

    event_size: int

    @nn.compact
    def __call__(self, x) -> MultivariateNormalTriL:
        x = _flatten(x)
        n = self.event_size + tril_size(self.event_size)
        params = Dense(n)(x)
        loc = params[:, : self.event_size]
        scale = fill_scale_tril(params[:, self.event_size :], self.event_size)
        return MultivariateNormalTriL(loc=loc, scale_tril=scale)


class OneDimensionalGMMHead(nn.Module):
    """Per-dimension Gaussian mixture head (reference distributions.py:116-134).
    Returns a GMM1D with batch shape [B, event_size]."""

    event_size: int
    num_components: int = 10

    @nn.compact
    def __call__(self, x) -> GMM1D:
        params = Dense(3 * self.num_components * self.event_size)(x)
        params = params.reshape(
            (*x.shape[:-1], self.event_size, 3 * self.num_components)
        )
        k = self.num_components
        logits = params[..., :k]
        means = params[..., k:-k]
        scales = softplus_scale(params[..., -k:])
        return GMM1D(logits=logits, means=means, scales=scales)


# ---------------------------------------------------------------------------
# Autoregressive GMM
# ---------------------------------------------------------------------------


def _agmm_net_out(net_params, x_o, mask, context, event_size, num_components):
    """One batched forward of the AGMM conditional net. Inputs have shape
    [..., D] / [..., D] / [..., C]; output is GMM1D with batch [..., D]."""
    inp = jnp.concatenate([x_o, mask, context], axis=-1)
    flat = inp.reshape((-1, inp.shape[-1]))
    out = pure_residual_mlp_apply(net_params, flat)
    out = out.reshape((*inp.shape[:-1], event_size, 3 * num_components))
    k = num_components
    return GMM1D(
        logits=out[..., :k],
        means=out[..., k:-k],
        scales=softplus_scale(out[..., -k:]),
    )


@struct.dataclass
class AutoregressiveGMM:
    """Autoregressive per-dimension GMM distribution (pure pytree).

    Equivalent of the reference's ``_AutoregressiveDistribution``
    (reference distributions.py:137-189), with two TPU-first changes:

    - ``log_prob`` evaluates all D teacher-forced conditionals in ONE batched
      network forward (the reference scans D sequential small matmuls,
      reference distributions.py:152-166); sampling remains inherently
      sequential and uses ``lax.fori_loop``.
    - the conditional network's parameters are plain pytree leaves carried on
      the distribution object, so it composes with vmap/scan like any other
      distribution here.
    """

    context: jnp.ndarray  # [B, C]
    net_params: Any
    event_size: int = struct.field(pytree_node=False)
    num_components: int = struct.field(pytree_node=False)

    def log_prob(self, value: jnp.ndarray) -> jnp.ndarray:
        """value: [..., B, D] broadcastable against context [B, C]."""
        d = self.event_size
        # Strictly-lower-triangular observation masks: mask[i, j] = j < i.
        masks = (
            jnp.arange(d)[None, :] < jnp.arange(d)[:, None]
        ).astype(value.dtype)  # [D, D]
        v = value[..., None, :]  # [..., B, 1, D]
        x_o = v * masks  # [..., B, D, D]
        bshape = x_o.shape[:-2]
        m = jnp.broadcast_to(masks, (*bshape, d, d))
        ctx = jnp.broadcast_to(
            self.context[..., None, :], (*bshape, d, self.context.shape[-1])
        )
        gmm = _agmm_net_out(
            self.net_params, x_o, m, ctx, d, self.num_components
        )
        # gmm batch shape: [..., B, D(step), D(dims)]; evaluate the i-th dim's
        # conditional at step i.
        lls = gmm.log_prob(v)  # [..., B, D, D]
        diag = jnp.diagonal(lls, axis1=-2, axis2=-1)  # [..., B, D]
        return jnp.sum(diag, axis=-1)

    def sample(self, key: jax.Array, sample_shape: tuple = ()) -> jnp.ndarray:
        import numpy as _np

        n = int(_np.prod(sample_shape)) if sample_shape else 1
        b = self.context.shape[0]
        d = self.event_size
        ctx = jnp.broadcast_to(
            self.context[None], (n, b, self.context.shape[-1])
        )
        dim_keys = jax.random.split(key, d)

        def body(i, x):
            mask = (jnp.arange(d) < i).astype(x.dtype)
            mask_b = jnp.broadcast_to(mask, x.shape)
            gmm = _agmm_net_out(
                self.net_params, x * mask_b, mask_b, ctx, d,
                self.num_components,
            )
            samples = gmm.sample(dim_keys[i])  # [n, b, d]
            onehot = jnp.broadcast_to(jnp.arange(d) == i, x.shape)
            return jnp.where(onehot, samples, x)

        init = jnp.zeros((n, b, d), self.context.dtype)
        out = jax.lax.fori_loop(0, d, body, init)
        if sample_shape == ():
            return out[0]
        return out.reshape((*sample_shape, b, d))

    def entropy(self) -> jnp.ndarray:
        raise NotImplementedError(
            "AutoregressiveGMM has no closed-form entropy (the reference's "
            "distrax-based version would raise here too)."
        )


class AutoregressiveGMMHead(nn.Module):
    """Head producing an AutoregressiveGMM (reference distributions.py:192-223)."""

    event_size: int
    num_components: int = 10
    residual_blocks: int = 2
    hidden_units: int = 256

    @nn.compact
    def __call__(self, x) -> AutoregressiveGMM:
        x = _flatten(x)
        in_dim = 2 * self.event_size + x.shape[-1]
        out_dim = 3 * self.num_components * self.event_size
        net_params = pure_residual_mlp_params(
            self,
            in_dim,
            self.hidden_units,
            self.residual_blocks,
            out_dim,
            name="ar_net",
        )
        return AutoregressiveGMM(
            context=x,
            net_params=net_params,
            event_size=self.event_size,
            num_components=self.num_components,
        )


_DISTRIBUTIONS = {
    "Bernoulli": BernoulliHead,
    "IdentityGaussian": IdentityGaussianHead,
    "DiagonalGaussian": DiagonalGaussianHead,
    "TriLGaussian": TriLGaussianHead,
    "OneDimensionalGMM": OneDimensionalGMMHead,
    "AutoregressiveGMM": AutoregressiveGMMHead,
}


def get_distribution(
    distribution_type: str,
    distribution_config: Optional[Mapping[str, Any]] = None,
    name: Optional[str] = None,
) -> nn.Module:
    """Head factory keyed by the reference's registry names
    (reference distributions.py:226-241)."""
    cfg: Dict[str, Any] = dict(distribution_config or {})
    return _DISTRIBUTIONS[distribution_type](**cfg, name=name)
