"""Shim of distrax's Distribution base — see tests/refshims/README.md.

Provides the subclassing surface the reference PixelCNN uses:
``sample(seed=..., sample_shape=...)`` dispatching to ``_sample_n``, plus the
two helper symbols pixel_cnn.py imports directly.
"""
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

IntLike = Union[int, np.integer]


def convert_seed_and_sample_shape(seed, sample_shape):
    if isinstance(sample_shape, (int, np.integer)):
        sample_shape = (int(sample_shape),)
    else:
        sample_shape = tuple(int(s) for s in sample_shape)
    if isinstance(seed, (int, np.integer)):
        seed = jax.random.PRNGKey(int(seed))
    return seed, sample_shape


class Distribution:
    def sample(self, *, seed, sample_shape=()):
        rng, shape = convert_seed_and_sample_shape(seed, sample_shape)
        n = int(np.prod(shape)) if shape else 1
        samples = self._sample_n(rng, n)
        if shape:
            return jnp.reshape(samples, shape + samples.shape[1:])
        return jnp.squeeze(samples, axis=0)
