"""Shim package — see tests/refshims/README.md."""
from distrax._src.distributions.distribution import (  # noqa: F401
    Distribution,
)
import jax
import jax.numpy as jnp


class Categorical:
    def __init__(self, logits=None, probs=None):
        if logits is None:
            logits = jnp.log(probs)
        self.logits = jnp.asarray(logits)

    def mode(self):
        return jnp.argmax(self.logits, axis=-1)

    def sample(self, seed, sample_shape=()):
        return jax.random.categorical(
            seed, self.logits, shape=tuple(sample_shape) + self.logits.shape[:-1]
        )

    def probs(self):
        return jax.nn.softmax(self.logits, axis=-1)
