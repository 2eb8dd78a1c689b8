"""Mixture distributions (per-dimension Gaussian mixtures)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from posterior_matching_tpu.distributions.normal import Normal


@struct.dataclass
class GMM1D:
    """A mixture of 1-D normals on the last parameter axis.

    ``logits``/``means``/``scales`` have shape ``[..., K]``; the distribution's
    batch shape is ``[...]`` and its event is a scalar. This is the pure-pytree
    equivalent of the ``tfd.MixtureSameFamily(Categorical, Normal)`` built by
    the reference's ``OneDimensionalGMM`` (reference distributions.py:116-134),
    where ``[...] == [batch, dims]``.
    """

    logits: jnp.ndarray
    means: jnp.ndarray
    scales: jnp.ndarray

    @property
    def num_components(self) -> int:
        return self.logits.shape[-1]

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        comp_lp = Normal(self.means, self.scales).log_prob(x[..., None])
        mix_lp = jax.nn.log_softmax(self.logits, axis=-1)
        return jax.scipy.special.logsumexp(comp_lp + mix_lp, axis=-1)

    def mean(self) -> jnp.ndarray:
        w = jax.nn.softmax(self.logits, axis=-1)
        return jnp.sum(w * self.means, axis=-1)

    def sample(self, key: jax.Array, sample_shape: tuple = ()) -> jnp.ndarray:
        k_comp, k_norm = jax.random.split(key)
        shape = tuple(sample_shape) + self.logits.shape[:-1]
        comp = jax.random.categorical(k_comp, self.logits, axis=-1, shape=shape)
        means = jnp.broadcast_to(
            self.means, shape + (self.num_components,)
        )
        scales = jnp.broadcast_to(
            self.scales, shape + (self.num_components,)
        )
        mu = jnp.take_along_axis(means, comp[..., None], axis=-1)[..., 0]
        sd = jnp.take_along_axis(scales, comp[..., None], axis=-1)[..., 0]
        eps = jax.random.normal(k_norm, shape, mu.dtype)
        return mu + sd * eps
