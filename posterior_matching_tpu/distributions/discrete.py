"""Discrete distributions (Bernoulli, Categorical) as pure pytrees."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Bernoulli:
    """Elementwise Bernoulli over logits (mirrors ``tfd.Bernoulli``,
    reference distributions.py:20-25 uses logits parameterization)."""

    logits: jnp.ndarray

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        # log p = x * log(sigmoid(l)) + (1-x) * log(1 - sigmoid(l))
        x = x.astype(self.logits.dtype)
        return x * jax.nn.log_sigmoid(self.logits) + (1.0 - x) * jax.nn.log_sigmoid(
            -self.logits
        )

    def probs(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.logits)

    def mean(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.logits)

    def mode(self) -> jnp.ndarray:
        return (self.logits > 0).astype(self.logits.dtype)

    def sample(self, key: jax.Array, sample_shape: tuple = ()) -> jnp.ndarray:
        shape = tuple(sample_shape) + self.logits.shape
        return jax.random.bernoulli(key, jax.nn.sigmoid(self.logits), shape).astype(
            self.logits.dtype
        )


@struct.dataclass
class Categorical:
    """Categorical over the last axis of ``logits``."""

    logits: jnp.ndarray

    @property
    def num_categories(self) -> int:
        return self.logits.shape[-1]

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        x = x.astype(jnp.int32)
        return jnp.take_along_axis(logp, x[..., None], axis=-1)[..., 0]

    def probs(self) -> jnp.ndarray:
        return jax.nn.softmax(self.logits, axis=-1)

    def mode(self) -> jnp.ndarray:
        return jnp.argmax(self.logits, axis=-1)

    def entropy(self) -> jnp.ndarray:
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        return -jnp.sum(jnp.exp(logp) * logp, axis=-1)

    def sample(self, key: jax.Array, sample_shape: tuple = ()) -> jnp.ndarray:
        shape = tuple(sample_shape) + self.logits.shape[:-1]
        return jax.random.categorical(key, self.logits, axis=-1, shape=shape)
