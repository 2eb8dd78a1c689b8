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


# -- small-matrix triangular solves ------------------------------------------
#
# XLA's batched TriangularSolve is pathologically slow on TPU for the tiny
# matrices the models use: at the VDVAE pm_kl shapes ([16, 28, 28] positions,
# k=16) ONE block's solves cost 16.9 ms on a v5e — most of the 235 ms train
# step across ~29 blocks (measured, BASELINE.md). Unrolled forward
# substitution over k steps of batched vector FMAs is 12x faster forward;
# autodiff through the unrolled graph is slow, so the backward is the
# hand-written adjoint (one transpose-solve + a masked outer product), which
# is again unrolled substitution.

_UNROLL_MAX_DIM = 32


# Layout note: the substitutions run TRANSPOSED, [k, k|r, *batch], so the
# (large) batch is the innermost/lane dimension. In the natural [..., k, r]
# layout the k/r=16-wide trailing axes use 16 of 128 VPU lanes — profiling
# the VDVAE step showed its add_multiply fusions (these chains) at ~32 ms;
# batch-innermost runs the same op count at full lane utilization.


def _unrolled_solve(tril: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Forward substitution for ``tril @ Y = rhs``; rhs ``[..., k, r]``."""
    k = tril.shape[-1]
    lt = jnp.moveaxis(tril, (-2, -1), (0, 1))  # [k, k, *batch]
    bt = jnp.moveaxis(rhs, (-2, -1), (0, 1))  # [k, r, *batch]
    rows = []
    for i in range(k):
        acc = bt[i]
        for j in range(i):
            acc = acc - lt[i, j][None] * rows[j]
        rows.append(acc / lt[i, i][None])
    return jnp.moveaxis(jnp.stack(rows), (0, 1), (-2, -1))


def _unrolled_solve_t(tril: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Back substitution for ``tril^T @ Y = rhs``; rhs ``[..., k, r]``."""
    k = tril.shape[-1]
    lt = jnp.moveaxis(tril, (-2, -1), (0, 1))
    bt = jnp.moveaxis(rhs, (-2, -1), (0, 1))
    rows: list = [None] * k
    for i in reversed(range(k)):
        acc = bt[i]
        for j in range(i + 1, k):
            acc = acc - lt[j, i][None] * rows[j]
        rows[i] = acc / lt[i, i][None]
    return jnp.moveaxis(jnp.stack(rows), (0, 1), (-2, -1))


@jax.custom_vjp
def tril_matsolve(tril: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solves ``tril @ Y = rhs`` for matrix ``rhs`` ``[..., k, r]`` with
    lower-triangular ``tril`` ``[..., k, k]`` (batch dims must match).

    Unrolled substitution for k <= 32 (see module note), XLA solve beyond.
    """
    if tril.shape[-1] <= _UNROLL_MAX_DIM:
        return _unrolled_solve(tril, rhs)
    return jax.scipy.linalg.solve_triangular(tril, rhs, lower=True)


def _tril_matsolve_fwd(tril, rhs):
    y = tril_matsolve(tril, rhs)
    return y, (tril, y)


def _tril_matsolve_bwd(res, g):
    # Adjoint of Y = L^-1 B:  dB = L^-T G;  dL = -tril(dB @ Y^T).
    tril, y = res
    if tril.shape[-1] <= _UNROLL_MAX_DIM:
        db = _unrolled_solve_t(tril, g)
        # The outer product is unrolled over r as f32 VPU FMAs (batch
        # innermost, see the layout note above): a batched-tiny einsum lowers
        # to MXU matmuls that are BOTH slower (9.9 ms vs 2.4 ms at
        # [16, 7157, 16, 16]) and bf16-by-default (9e-2 abs gradient error
        # unless Precision.HIGHEST, which is slower still).
        r = y.shape[-1]
        dbt = jnp.moveaxis(db, (-2, -1), (0, 1))  # [k, r, *batch]
        yt = jnp.moveaxis(y, (-2, -1), (0, 1))
        dl_t = -sum(dbt[:, m][:, None] * yt[:, m][None, :] for m in range(r))
        dl = jnp.tril(jnp.moveaxis(dl_t, (0, 1), (-2, -1)))
    else:
        db = jax.scipy.linalg.solve_triangular(
            tril, g, lower=True, trans=1
        )
        # Large-k fallback: matrices this size tile well on the MXU, and the
        # unrolled sum would emit k broadcast-multiply terms each
        # materializing a [k, k, *batch] intermediate (compile-time and
        # peak-memory blowup). One batched matmul at HIGHEST precision keeps
        # f32 accuracy.
        dl = -jnp.tril(
            jnp.matmul(
                db,
                jnp.swapaxes(y, -1, -2),
                precision=jax.lax.Precision.HIGHEST,
            )
        )
    return dl, db


tril_matsolve.defvjp(_tril_matsolve_fwd, _tril_matsolve_bwd)


def tril_solve(tril: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solves ``tril @ y = rhs`` for y with lower-triangular ``tril``.

    ``rhs`` has shape ``[..., dim]``; batch dims broadcast against ``tril``'s.
    """
    tril = jnp.broadcast_to(tril, rhs.shape + rhs.shape[-1:])
    return tril_matsolve(tril, rhs[..., None])[..., 0]


def tril_inverse_scaled(tril: jnp.ndarray, diag: jnp.ndarray) -> jnp.ndarray:
    """``tril^-1 @ diag(d)`` as one multi-RHS unrolled solve — the
    ``tr(Sq^-1 Sp)`` building block of KL(diag || TriL)."""
    k = tril.shape[-1]
    rhs = jnp.eye(k, dtype=tril.dtype) * diag[..., None, :]
    return tril_matsolve(jnp.broadcast_to(tril, rhs.shape), rhs)


# -- fused KL(diag || TriL) ---------------------------------------------------
#
# The VDVAE's pm_kl (reference vdvae.py:546-569) evaluates
#   KL = 0.5 (||L^-1 D||_F^2 + ||L^-1 d||^2 - k) + log|L| - log|D|
# with D = diag(sp), d = mq - mp, at [B, positions] batches of k<=16. The
# composite path (two custom-VJP solves + autodiff glue) costs ~19 ms of the
# VDVAE gradient; hand-deriving the WHOLE KL's adjoint collapses it to:
#   forward: ONE multi-RHS substitution solve of the stacked [D | d]
#   backward: ONE transpose-solve of g*M + one masked outer-product
# Derivation (Y = L^-1 B => dB = L^-T Ybar, dL = -tril(L^-T Ybar Y^T)):
#   M = L^-1 [D | d], dKL/dM = g*M
#   W = L^-T (g*M); dD = W[:, :k] => dsp_a = W[a, a]; dd = W[:, k]
#   dL = -tril(W M^T) + g*diag(1/diag(L));  dsp += -g/sp;
#   dmq = dd, dmp = -dd.


@jax.custom_vjp
def kl_diag_tril(loc_p, scale_p, loc_q, tril_q):
    """KL(N(loc_p, diag(scale_p)^2) || N(loc_q, L L^T)) with one fused solve
    and a hand-derived single-pass adjoint.

    All batch dims must match exactly (callers broadcast first);
    ``tril_q``: [..., k, k], others [..., k]. k <= 32 uses unrolled
    substitution (see module note), larger k the XLA solve.
    """
    return _kl_diag_tril_impl(loc_p, scale_p, loc_q, tril_q)[0]


def _kl_solve(tril, rhs):
    if tril.shape[-1] <= _UNROLL_MAX_DIM:
        return _unrolled_solve(tril, rhs)
    return jax.scipy.linalg.solve_triangular(tril, rhs, lower=True)


def _kl_solve_t(tril, rhs):
    if tril.shape[-1] <= _UNROLL_MAX_DIM:
        return _unrolled_solve_t(tril, rhs)
    return jax.scipy.linalg.solve_triangular(tril, rhs, lower=True, trans=1)


def _kl_diag_tril_impl(loc_p, scale_p, loc_q, tril_q):
    k = tril_q.shape[-1]
    eye = jnp.eye(k, dtype=tril_q.dtype)
    rhs = jnp.concatenate(
        [eye * scale_p[..., None, :], (loc_q - loc_p)[..., None]], axis=-1
    )  # [..., k, k+1] = [D | d]
    m = _kl_solve(tril_q, rhs)
    quad = jnp.sum(m * m, axis=(-2, -1))
    log_det_q = jnp.sum(
        jnp.log(jnp.diagonal(tril_q, axis1=-2, axis2=-1)), axis=-1
    )
    log_det_p = jnp.sum(jnp.log(scale_p), axis=-1)
    kl = 0.5 * (quad - k) + log_det_q - log_det_p
    return kl, m


def _kl_diag_tril_fwd(loc_p, scale_p, loc_q, tril_q):
    kl, m = _kl_diag_tril_impl(loc_p, scale_p, loc_q, tril_q)
    return kl, (m, scale_p, tril_q)


def _kl_diag_tril_bwd(res, g):
    m, scale_p, tril_q = res
    k = tril_q.shape[-1]
    w = _kl_solve_t(tril_q, m * g[..., None, None])  # [..., k, k+1]

    # dL = -tril(W M^T): unrolled outer product over the k+1 RHS columns as
    # f32 VPU FMAs in the transposed (batch-innermost) layout — same
    # rationale as _tril_matsolve_bwd.
    if k <= _UNROLL_MAX_DIM:
        wt = jnp.moveaxis(w, (-2, -1), (0, 1))  # [k, k+1, *batch]
        mt = jnp.moveaxis(m, (-2, -1), (0, 1))
        dl_t = -sum(
            wt[:, j][:, None] * mt[:, j][None, :] for j in range(k + 1)
        )
        dl = jnp.tril(jnp.moveaxis(dl_t, (0, 1), (-2, -1)))
    else:
        dl = -jnp.tril(
            jnp.matmul(
                w,
                jnp.swapaxes(m, -1, -2),
                precision=jax.lax.Precision.HIGHEST,
            )
        )
    rng = jnp.arange(k)
    diag_l = jnp.diagonal(tril_q, axis1=-2, axis2=-1)
    dl = dl.at[..., rng, rng].add(g[..., None] / diag_l)

    dsp = jnp.diagonal(w[..., :k], axis1=-2, axis2=-1) - g[..., None] / scale_p
    dd = w[..., k]
    return -dd, dsp, dd, dl


kl_diag_tril.defvjp(_kl_diag_tril_fwd, _kl_diag_tril_bwd)


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
