"""Textbook shim of ``tfp.substrates.jax.distributions`` — see README.md.

Only the surface used by the reference models (vae.py, vdvae.py,
distributions.py, pixel_cnn.py, vqvae.py) is provided. Everything is written
from the standard published formulas in plain jax.numpy.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

NOT_REPARAMETERIZED = "NOT_REPARAMETERIZED"
FULLY_REPARAMETERIZED = "FULLY_REPARAMETERIZED"

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def _shape_tuple(sample_shape):
    """tfp accepts an int or a sequence for ``sample_shape``."""
    if isinstance(sample_shape, int):
        return (sample_shape,)
    return tuple(sample_shape)


class Distribution:
    """Minimal base: subclasses override log_prob/sample/etc. directly."""

    def __init__(self, dtype=None, reparameterization_type=None,
                 validate_args=False, allow_nan_stats=True, name=None):
        self._dtype = dtype
        self._name = name or type(self).__name__

    def kl_divergence(self, other):
        return _kl(self, other)


class Normal(Distribution):
    def __init__(self, loc, scale):
        super().__init__()
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(self.loc.shape, self.scale.shape)

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - _HALF_LOG_2PI

    def sample(self, seed, sample_shape=()):
        shape = _shape_tuple(sample_shape) + jnp.broadcast_shapes(
            self.loc.shape, self.scale.shape
        )
        return self.loc + self.scale * jax.random.normal(seed, shape)

    def mean(self):
        return jnp.broadcast_to(
            self.loc, jnp.broadcast_shapes(self.loc.shape, self.scale.shape)
        )

    def entropy(self):
        return _HALF_LOG_2PI + 0.5 + jnp.log(self.scale) + 0.0 * self.loc


class Logistic(Distribution):
    def __init__(self, loc, scale):
        super().__init__()
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(self.loc.shape, self.scale.shape)

    def _z(self, x):
        return (x - self.loc) / self.scale

    def log_cdf(self, x):
        return jax.nn.log_sigmoid(self._z(x))

    def cdf(self, x):
        return jax.nn.sigmoid(self._z(x))

    def log_survival_function(self, x):
        return jax.nn.log_sigmoid(-self._z(x))

    def log_prob(self, x):
        z = self._z(x)
        return -z - 2.0 * jax.nn.softplus(-z) - jnp.log(self.scale)

    def mean(self):
        return jnp.broadcast_to(
            self.loc, jnp.broadcast_shapes(self.loc.shape, self.scale.shape)
        )


class Bernoulli(Distribution):
    def __init__(self, logits=None, probs=None, dtype=jnp.int32):
        super().__init__()
        if logits is None:
            logits = jnp.log(probs) - jnp.log1p(-probs)
        self.logits = jnp.asarray(logits)

    @property
    def batch_shape(self):
        return self.logits.shape

    def log_prob(self, x):
        x = jnp.asarray(x, self.logits.dtype)
        return -jax.nn.softplus(-self.logits) * x - jax.nn.softplus(
            self.logits
        ) * (1.0 - x)

    def mean(self):
        return jax.nn.sigmoid(self.logits)

    def sample(self, seed, sample_shape=()):
        shape = _shape_tuple(sample_shape) + self.logits.shape
        u = jax.random.uniform(seed, shape)
        return (u < jax.nn.sigmoid(self.logits)).astype(jnp.int32)


class Categorical(Distribution):
    def __init__(self, logits=None, probs=None):
        # tfp's Categorical samples (and therefore `.dtype`) default to
        # int32; reference pixel_cnn.py:62 casts log_prob inputs to it.
        super().__init__(dtype=jnp.int32)
        if logits is None:
            logits = jnp.log(probs)
        self.logits = jnp.asarray(logits)

    @property
    def dtype(self):
        return self._dtype

    @property
    def batch_shape(self):
        return self.logits.shape[:-1]

    def log_prob(self, x):
        lp = jax.nn.log_softmax(self.logits, axis=-1)
        return jnp.take_along_axis(
            lp, jnp.asarray(x, jnp.int32)[..., None], axis=-1
        )[..., 0]

    def sample(self, seed, sample_shape=()):
        shape = _shape_tuple(sample_shape) + self.logits.shape[:-1]
        return jax.random.categorical(seed, self.logits, shape=shape)

    def mode(self):
        return jnp.argmax(self.logits, axis=-1)


class Independent(Distribution):
    def __init__(self, distribution, reinterpreted_batch_ndims=None):
        super().__init__()
        self.distribution = distribution
        if reinterpreted_batch_ndims is None:
            # tfp's default: reinterpret ALL of the inner distribution's
            # batch dims except the leftmost (the reference's VDVAE relies
            # on this to reduce [b, h, w] block posteriors to [b]).
            reinterpreted_batch_ndims = max(
                len(distribution.batch_shape) - 1, 0)
        self.ndims = reinterpreted_batch_ndims

    @property
    def batch_shape(self):
        shape = self.distribution.batch_shape
        return shape[: len(shape) - self.ndims]

    def _sum(self, x):
        if self.ndims == 0:
            return x
        return jnp.sum(x, axis=tuple(range(x.ndim - self.ndims, x.ndim)))

    def log_prob(self, x):
        return self._sum(self.distribution.log_prob(x))

    def sample(self, seed, sample_shape=()):
        return self.distribution.sample(seed, sample_shape)

    def mean(self):
        return self.distribution.mean()

    def entropy(self):
        return self._sum(self.distribution.entropy())

    def kl_divergence(self, other):
        inner_other = other.distribution if isinstance(other, Independent) else other
        return self._sum(_kl(self.distribution, inner_other))


class MultivariateNormalDiag(Distribution):
    def __init__(self, loc, scale_diag):
        super().__init__()
        self.loc = jnp.asarray(loc)
        self.scale_diag = jnp.asarray(scale_diag)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(
            self.loc.shape, self.scale_diag.shape)[:-1]

    def log_prob(self, x):
        z = (x - self.loc) / self.scale_diag
        return jnp.sum(
            -0.5 * z * z - jnp.log(self.scale_diag) - _HALF_LOG_2PI, axis=-1
        )

    def sample(self, seed, sample_shape=()):
        shape = _shape_tuple(sample_shape) + jnp.broadcast_shapes(
            self.loc.shape, self.scale_diag.shape
        )
        return self.loc + self.scale_diag * jax.random.normal(seed, shape)

    def mean(self):
        return jnp.broadcast_to(
            self.loc,
            jnp.broadcast_shapes(self.loc.shape, self.scale_diag.shape),
        )

    def entropy(self):
        k = self.loc.shape[-1]
        return (
            k * (_HALF_LOG_2PI + 0.5)
            + jnp.sum(jnp.log(self.scale_diag), axis=-1)
            + 0.0 * jnp.sum(self.loc, axis=-1)
        )


class MultivariateNormalTriL(Distribution):
    def __init__(self, loc, scale_tril):
        super().__init__()
        self.loc = jnp.asarray(loc)
        self.scale_tril = jnp.asarray(scale_tril)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(
            self.loc.shape, self.scale_tril.shape[:-1])[:-1]

    def log_prob(self, x):
        diff = x - self.loc
        tril = jnp.broadcast_to(
            self.scale_tril, diff.shape + diff.shape[-1:]
        )
        z = jax.scipy.linalg.solve_triangular(
            tril, diff[..., None], lower=True
        )[..., 0]
        half_logdet = jnp.sum(
            jnp.log(jnp.diagonal(tril, axis1=-2, axis2=-1)), axis=-1
        )
        k = diff.shape[-1]
        return (
            -0.5 * jnp.sum(z * z, axis=-1) - half_logdet - k * _HALF_LOG_2PI
        )

    def sample(self, seed, sample_shape=()):
        shape = _shape_tuple(sample_shape) + jnp.broadcast_shapes(
            self.loc.shape, self.scale_tril.shape[:-1]
        )
        eps = jax.random.normal(seed, shape)
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)

    def mean(self):
        return jnp.broadcast_to(
            self.loc,
            jnp.broadcast_shapes(self.loc.shape, self.scale_tril.shape[:-1]),
        )


class TransformedDistribution(Distribution):
    """Only the Shift bijector is ever used by the reference."""

    def __init__(self, distribution, bijector):
        super().__init__()
        self.distribution = distribution
        self.bijector = bijector

    @property
    def batch_shape(self):
        return self.distribution.batch_shape

    def log_cdf(self, y):
        return self.distribution.log_cdf(self.bijector.inverse(y))

    def cdf(self, y):
        return self.distribution.cdf(self.bijector.inverse(y))

    def log_survival_function(self, y):
        return self.distribution.log_survival_function(self.bijector.inverse(y))

    def log_prob(self, y):
        # Shift has unit Jacobian.
        return self.distribution.log_prob(self.bijector.inverse(y))


class QuantizedDistribution(Distribution):
    """tfp semantics on integer-valued ``y`` in ``[low, high]``:
    P[Y=low] = cdf(low); P[Y=high] = sf(high-1); else cdf(y) - cdf(y-1).
    """

    def __init__(self, distribution, low=None, high=None):
        super().__init__()
        self.distribution = distribution
        self.low = low
        self.high = high

    @property
    def batch_shape(self):
        return self.distribution.batch_shape

    def log_prob(self, y):
        d = self.distribution
        log_cdf_y = d.log_cdf(y)
        log_cdf_ym1 = d.log_cdf(y - 1.0)
        log_sf_ym1 = d.log_survival_function(y - 1.0)
        log_sf_y = d.log_survival_function(y)
        # Stable log(cdf(y) - cdf(y-1)): use whichever side is smaller.
        # log_sub_exp(a, b) with a >= b.
        def log_sub_exp(a, b):
            return a + jnp.log1p(-jnp.exp(jnp.minimum(b - a, -1e-12)))

        mid = jnp.where(
            log_cdf_y < log_sf_y,
            log_sub_exp(log_cdf_y, log_cdf_ym1),
            log_sub_exp(log_sf_ym1, log_sf_y),
        )
        out = mid
        if self.low is not None:
            out = jnp.where(y <= self.low, log_cdf_y, out)
        if self.high is not None:
            out = jnp.where(y >= self.high, log_sf_ym1, out)
        return out


class MixtureSameFamily(Distribution):
    def __init__(self, mixture_distribution, components_distribution):
        super().__init__()
        self.mixture_distribution = mixture_distribution
        self.components_distribution = components_distribution

    @property
    def batch_shape(self):
        return self.components_distribution.batch_shape[:-1]

    def log_prob(self, x):
        # The component axis sits immediately left of the components'
        # event axes; expand x there. Independent components carry their
        # event ndims; bare distributions (e.g. Normal in the 1-D GMM)
        # have scalar events -> expand at the last axis.
        ndims = getattr(self.components_distribution, "ndims", 0)
        x_exp = jnp.expand_dims(jnp.asarray(x), axis=-(ndims + 1))
        comp_lp = self.components_distribution.log_prob(x_exp)
        mix_lp = jax.nn.log_softmax(self.mixture_distribution.logits, axis=-1)
        return jax.scipy.special.logsumexp(comp_lp + mix_lp, axis=-1)

    def sample(self, seed, sample_shape=()):
        k_mix, k_comp = jax.random.split(seed)
        idx = self.mixture_distribution.sample(k_mix, sample_shape)
        comps = self.components_distribution.sample(k_comp, sample_shape)
        ndims = getattr(self.components_distribution, "ndims", 0)
        idx_exp = idx[(...,) + (None,) * (ndims + 1)]
        return jnp.take_along_axis(
            comps, jnp.broadcast_to(
                idx_exp, idx_exp.shape[:-ndims - 1] + (1,) + comps.shape[
                    comps.ndim - ndims:
                ]
            ), axis=-(ndims + 1)
        ).squeeze(axis=-(ndims + 1))


def _kl(p, q):
    if isinstance(p, Independent):
        return p.kl_divergence(q)
    if isinstance(p, Normal) and isinstance(q, Normal):
        var_ratio = (p.scale / q.scale) ** 2
        t = ((p.loc - q.loc) / q.scale) ** 2
        return 0.5 * (var_ratio + t - 1.0 - jnp.log(var_ratio))
    if isinstance(p, MultivariateNormalDiag) and isinstance(
        q, MultivariateNormalDiag
    ):
        var_ratio = (p.scale_diag / q.scale_diag) ** 2
        t = ((p.loc - q.loc) / q.scale_diag) ** 2
        return 0.5 * jnp.sum(
            var_ratio + t - 1.0 - jnp.log(var_ratio), axis=-1
        )
    if isinstance(p, MultivariateNormalDiag) and isinstance(
        q, MultivariateNormalTriL
    ):
        # KL(N(m1, diag(s)^2) || N(m2, L L^T)) =
        #   0.5*(tr((LL^T)^-1 diag(s^2)) + |L^-1 (m2-m1)|^2 - k)
        #   + log|L| - sum log s
        k = p.loc.shape[-1]
        tril = jnp.broadcast_to(
            q.scale_tril,
            jnp.broadcast_shapes(
                q.scale_tril.shape[:-2], p.loc.shape[:-1], p.scale_diag.shape[:-1]
            )
            + q.scale_tril.shape[-2:],
        )
        s = jnp.broadcast_to(
            p.scale_diag, tril.shape[:-2] + p.scale_diag.shape[-1:]
        )
        rhs = jnp.eye(k, dtype=tril.dtype) * s[..., None, :]
        a = jax.scipy.linalg.solve_triangular(tril, rhs, lower=True)
        trace = jnp.sum(a * a, axis=(-2, -1))
        diff = q.loc - p.loc
        z = jax.scipy.linalg.solve_triangular(
            tril, jnp.broadcast_to(diff, tril.shape[:-2] + diff.shape[-1:])[
                ..., None
            ], lower=True
        )[..., 0]
        maha = jnp.sum(z * z, axis=-1)
        logdet_q = jnp.sum(
            jnp.log(jnp.diagonal(tril, axis1=-2, axis2=-1)), axis=-1
        )
        logdet_p = jnp.sum(jnp.log(s), axis=-1)
        return 0.5 * (trace + maha - k) + logdet_q - logdet_p
    if isinstance(p, MultivariateNormalTriL) and isinstance(
        q, MultivariateNormalDiag
    ):
        # KL(N(m1, L L^T) || N(m2, diag(s)^2)) =
        #   0.5*(sum_ij (L_ij / s_i)^2 + ||(m1-m2)/s||^2 - k)
        #   + sum log s - sum log diag(L)
        k = p.loc.shape[-1]
        inv_s = 1.0 / q.scale_diag
        trace = jnp.sum(
            (p.scale_tril * inv_s[..., :, None]) ** 2, axis=(-2, -1)
        )
        maha = jnp.sum(((p.loc - q.loc) * inv_s) ** 2, axis=-1)
        logdet_q = jnp.sum(jnp.log(q.scale_diag), axis=-1) + 0.0 * maha
        logdet_p = jnp.sum(
            jnp.log(jnp.diagonal(p.scale_tril, axis1=-2, axis2=-1)), axis=-1
        )
        return 0.5 * (trace + maha - k) + logdet_q - logdet_p
    raise NotImplementedError(
        f"shim KL not registered for {type(p).__name__} || {type(q).__name__}"
    )


def kl_divergence(p, q):
    return _kl(p, q)
