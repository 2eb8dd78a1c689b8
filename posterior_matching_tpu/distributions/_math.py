"""Numerical helpers shared by the distribution library.

These are the low-level building blocks that replace the tfp bijector machinery
used by the reference (e.g. ``tfb.FillScaleTriL`` in
reference ``posterior_matching/models/distributions.py:111``) with plain,
fusion-friendly JAX functions.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG_2PI = math.log(2.0 * math.pi)
HALF_LOG_2PI = 0.5 * LOG_2PI
LOG_2PIE = math.log(2.0 * math.pi * math.e)


def tril_size(dim: int) -> int:
    """Number of entries in a lower-triangular ``dim x dim`` matrix."""
    return dim * (dim + 1) // 2


def fill_triangular(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Packs the last axis of ``x`` (length ``dim*(dim+1)//2``) into a lower
    triangular matrix ``[..., dim, dim]``.

    Row-major packing: ``[[v0 0 0], [v1 v2 0], [v3 v4 v5]]``. (The packing
    order only has to be a fixed bijection; we use the obvious one rather than
    tfp's rotated layout.)
    """
    rows, cols = jnp.tril_indices(dim)
    out = jnp.zeros((*x.shape[:-1], dim, dim), x.dtype)
    return out.at[..., rows, cols].set(x)


def fill_scale_tril(
    x: jnp.ndarray, dim: int, diag_shift: float = 1e-5
) -> jnp.ndarray:
    """Maps an unconstrained vector to a valid scale matrix (lower triangular
    with positive diagonal), the equivalent of tfp's ``FillScaleTriL``:
    ``diag = softplus(raw) + diag_shift``.
    """
    tril = fill_triangular(x, dim)
    diag = jax.nn.softplus(jnp.diagonal(tril, axis1=-2, axis2=-1)) + diag_shift
    rng = jnp.arange(dim)
    return tril.at[..., rng, rng].set(diag)


def softplus_scale(x: jnp.ndarray, shift: float = 1e-5) -> jnp.ndarray:
    """The positive-scale transform used throughout the reference models
    (``jax.nn.softplus(x) + 1e-5``, reference distributions.py:82)."""
    return jax.nn.softplus(x) + shift


def tril_solve(tril: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solves ``tril @ y = rhs`` for y with lower-triangular ``tril``.

    ``rhs`` has shape ``[..., dim]``; batch dims broadcast against ``tril``'s.
    """
    return jax.scipy.linalg.solve_triangular(
        tril, rhs[..., None], lower=True
    )[..., 0]


def log_ndtr_diff_stable(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """log(sigmoid(b) - sigmoid(a)) computed stably for b > a (logistic CDF)."""
    # sigmoid(b) - sigmoid(a) = sigmoid(b) * sigmoid(-a) * (1 - exp(a - b))
    return (
        jax.nn.log_sigmoid(b)
        + jax.nn.log_sigmoid(-a)
        + jnp.log1p(-jnp.exp(a - b))
    )


def sum_rightmost(x: jnp.ndarray, ndims: int) -> jnp.ndarray:
    """Sums the rightmost ``ndims`` axes (Independent reinterpretation)."""
    if ndims == 0:
        return x
    return jnp.sum(x, axis=tuple(range(x.ndim - ndims, x.ndim)))
