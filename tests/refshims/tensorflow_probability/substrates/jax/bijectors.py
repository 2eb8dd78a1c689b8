"""Textbook shim of ``tfp.substrates.jax.bijectors`` — see README.md.

``FillScaleTriL`` replicates tfp's EXACT layout (the concat-flip-reshape
``fill_triangular`` trick and the softplus-then-shift diagonal transform) so
raw parameter vectors map to the same matrices the reference produced with
real tfp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Shift:
    def __init__(self, shift):
        self.shift = shift

    def forward(self, x):
        return x + self.shift

    def inverse(self, y):
        return y - self.shift

    def __call__(self, x):
        return self.forward(x)


def _fill_triangular(x):
    """tfp.math.fill_triangular (lower): for m = n(n+1)/2 inputs, build
    [x[n:], flip(x)], reshape to [n, n], take tril. This is tfp's documented
    algorithm — it defines WHICH vector slot lands on which matrix entry,
    i.e. the layout golden values depend on."""
    m = x.shape[-1]
    n = int(np.sqrt(0.25 + 2.0 * m) - 0.5)
    if n * (n + 1) // 2 != m:
        raise ValueError(f"last dim {m} is not a triangular number")
    tail = x[..., n:]
    xc = jnp.concatenate([tail, jnp.flip(x, axis=-1)], axis=-1)
    y = jnp.reshape(xc, x.shape[:-1] + (n, n))
    return jnp.tril(y)


class FillScaleTriL:
    """tfp default: diag_bijector = Chain([Shift(diag_shift), Softplus()]),
    i.e. diag -> softplus(diag) + 1e-5."""

    def __init__(self, diag_shift=1e-5):
        self.diag_shift = diag_shift

    def forward(self, x):
        tril = _fill_triangular(x)
        n = tril.shape[-1]
        diag = jax.nn.softplus(jnp.diagonal(tril, axis1=-2, axis2=-1))
        diag = diag + self.diag_shift
        rng = jnp.arange(n)
        return tril.at[..., rng, rng].set(diag)

    def __call__(self, x):
        return self.forward(x)
