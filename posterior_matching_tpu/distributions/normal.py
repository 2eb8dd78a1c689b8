"""Gaussian distributions as pure pytrees.

TPU-first replacement for the tfp distribution objects used in the reference
(``tfd.Normal``/``tfd.MultivariateNormalDiag``/``tfd.MultivariateNormalTriL``
in reference ``posterior_matching/models/distributions.py``): each distribution
is a ``flax.struct`` dataclass of arrays, so it passes freely through ``jit``,
``vmap``, ``lax.scan`` and shardings, and every method lowers to a handful of
fusable XLA ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from posterior_matching_tpu.distributions._math import (
    HALF_LOG_2PI,
    LOG_2PI,
    LOG_2PIE,
    kl_diag_tril,
    sum_rightmost,
    tril_inverse_scaled,
    tril_matsolve,
    tril_solve,
)


@struct.dataclass
class Normal:
    """Elementwise (fully factorized) normal distribution.

    ``loc``/``scale`` have identical shapes; all methods are elementwise
    (mirrors ``tfd.Normal``).
    """

    loc: jnp.ndarray
    scale: jnp.ndarray

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        z = (x - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - HALF_LOG_2PI

    def sample(self, key: jax.Array, sample_shape: tuple = ()) -> jnp.ndarray:
        shape = tuple(sample_shape) + self.loc.shape
        eps = jax.random.normal(key, shape, self.loc.dtype)
        return self.loc + self.scale * eps

    def mean(self) -> jnp.ndarray:
        return self.loc

    def mode(self) -> jnp.ndarray:
        return self.loc

    def stddev(self) -> jnp.ndarray:
        return self.scale

    def entropy(self) -> jnp.ndarray:
        return 0.5 * LOG_2PIE + jnp.log(self.scale)

    def kl_divergence(self, other: "Normal") -> jnp.ndarray:
        var_ratio = (self.scale / other.scale) ** 2
        t1 = ((self.loc - other.loc) / other.scale) ** 2
        return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


@struct.dataclass
class MultivariateNormalDiag:
    """MVN with diagonal covariance; event is the last axis of ``loc``."""

    loc: jnp.ndarray
    scale_diag: jnp.ndarray

    @property
    def event_size(self) -> int:
        return self.loc.shape[-1]

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        z = (x - self.loc) / self.scale_diag
        return -0.5 * jnp.sum(z * z + LOG_2PI, axis=-1) - jnp.sum(
            jnp.log(self.scale_diag), axis=-1
        )

    def sample(self, key: jax.Array, sample_shape: tuple = ()) -> jnp.ndarray:
        shape = tuple(sample_shape) + self.loc.shape
        eps = jax.random.normal(key, shape, self.loc.dtype)
        return self.loc + self.scale_diag * eps

    def mean(self) -> jnp.ndarray:
        return self.loc

    def entropy(self) -> jnp.ndarray:
        k = self.event_size
        return 0.5 * k * LOG_2PIE + jnp.sum(jnp.log(self.scale_diag), axis=-1)

    def kl_divergence(self, other) -> jnp.ndarray:
        if isinstance(other, MultivariateNormalDiag):
            var_ratio = (self.scale_diag / other.scale_diag) ** 2
            t1 = ((self.loc - other.loc) / other.scale_diag) ** 2
            return 0.5 * jnp.sum(
                var_ratio + t1 - 1.0 - jnp.log(var_ratio), axis=-1
            )
        if isinstance(other, MultivariateNormalTriL):
            return _kl_diag_tril(self, other)
        raise NotImplementedError(type(other))


@struct.dataclass
class MultivariateNormalTriL:
    """MVN with full covariance given by a lower-triangular scale factor.

    ``scale_tril`` has shape ``[..., k, k]``, ``loc`` shape ``[..., k]``.
    Replaces ``tfd.MultivariateNormalTriL`` (reference distributions.py:113).
    """

    loc: jnp.ndarray
    scale_tril: jnp.ndarray

    @property
    def event_size(self) -> int:
        return self.loc.shape[-1]

    def _log_det(self) -> jnp.ndarray:
        return jnp.sum(
            jnp.log(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1)), axis=-1
        )

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        diff = x - self.loc
        # Broadcast scale_tril batch dims against diff batch dims.
        z = tril_solve(
            jnp.broadcast_to(
                self.scale_tril, diff.shape + (self.event_size,)
            ),
            diff,
        )
        k = self.event_size
        return (
            -0.5 * jnp.sum(z * z, axis=-1)
            - 0.5 * k * LOG_2PI
            - self._log_det()
        )

    def sample(self, key: jax.Array, sample_shape: tuple = ()) -> jnp.ndarray:
        shape = tuple(sample_shape) + self.loc.shape
        eps = jax.random.normal(key, shape, self.loc.dtype)
        return self.loc + jnp.einsum(
            "...ij,...j->...i", self.scale_tril, eps,
            precision=jax.lax.Precision.HIGHEST,
        )

    def mean(self) -> jnp.ndarray:
        return self.loc

    def entropy(self) -> jnp.ndarray:
        k = self.event_size
        return 0.5 * k * LOG_2PIE + self._log_det()

    def kl_divergence(self, other) -> jnp.ndarray:
        if isinstance(other, MultivariateNormalTriL):
            return _kl_tril_tril(self, other)
        if isinstance(other, MultivariateNormalDiag):
            return _kl_tril_diag(self, other)
        raise NotImplementedError(type(other))


def _kl_diag_tril(
    p: MultivariateNormalDiag, q: MultivariateNormalTriL
) -> jnp.ndarray:
    """KL(diag MVN || TriL MVN), the VDVAE pm_kl (reference vdvae.py:569).

    0.5 * (tr(Sq^-1 Sp) + (mq-mp)^T Sq^-1 (mq-mp) - k + logdet Sq - logdet Sp)
    with Sq = L L^T. Delegates to the fully-fused custom-VJP kernel
    (``_math.kl_diag_tril``): ONE stacked [D | d] substitution solve forward,
    one transpose-solve + masked outer product backward.
    """
    k = p.event_size
    batch = jnp.broadcast_shapes(
        p.loc.shape[:-1], p.scale_diag.shape[:-1],
        q.loc.shape[:-1], q.scale_tril.shape[:-2],
    )
    return kl_diag_tril(
        jnp.broadcast_to(p.loc, batch + (k,)),
        jnp.broadcast_to(p.scale_diag, batch + (k,)),
        jnp.broadcast_to(q.loc, batch + (k,)),
        jnp.broadcast_to(q.scale_tril, batch + (k, k)),
    )


def _kl_tril_diag(
    p: MultivariateNormalTriL, q: MultivariateNormalDiag
) -> jnp.ndarray:
    """KL(TriL MVN || diag MVN): the PM-VAE posterior-vs-standard-prior KL
    (reference vae.py:130 with a TriLGaussian posterior)."""
    k = p.event_size
    lp = jnp.broadcast_to(p.scale_tril, p.loc.shape + (k,))
    inv_sq = 1.0 / q.scale_diag
    trace = jnp.sum((lp * inv_sq[..., :, None]) ** 2, axis=(-2, -1))
    maha = jnp.sum(((q.loc - p.loc) * inv_sq) ** 2, axis=-1)
    log_det_q = jnp.sum(jnp.log(q.scale_diag), axis=-1)
    log_det_p = jnp.sum(
        jnp.log(jnp.diagonal(p.scale_tril, axis1=-2, axis2=-1)), axis=-1
    )
    return 0.5 * (trace + maha - k) + log_det_q - log_det_p


def _kl_tril_tril(
    p: MultivariateNormalTriL, q: MultivariateNormalTriL
) -> jnp.ndarray:
    k = p.event_size
    lq = jnp.broadcast_to(q.scale_tril, p.loc.shape + (k,))
    lp = jnp.broadcast_to(p.scale_tril, p.loc.shape + (k,))
    m = tril_matsolve(lq, lp)
    trace = jnp.sum(m * m, axis=(-2, -1))
    diff = q.loc - p.loc
    maha = jnp.sum(tril_solve(lq, diff) ** 2, axis=-1)
    log_det_q = jnp.sum(
        jnp.log(jnp.diagonal(q.scale_tril, axis1=-2, axis2=-1)), axis=-1
    )
    log_det_p = jnp.sum(
        jnp.log(jnp.diagonal(p.scale_tril, axis1=-2, axis2=-1)), axis=-1
    )
    return 0.5 * (trace + maha - k) + log_det_q - log_det_p
