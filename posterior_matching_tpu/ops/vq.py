"""Vector-quantization ops: fused nearest-neighbor codebook search.

The reference delegates quantization to ``hk.nets.VectorQuantizerEMA``
(reference vqvae.py:66-72), whose distance computation materializes the full
``[N, K]`` distance matrix in HBM before the argmin. Here the search is a
single MXU matmul (``z @ codebook^T``) fused with the norm terms and the
argmin; a Pallas kernel (:func:`nearest_codebook_indices_pallas`) tiles the
computation through VMEM so the ``[N, K]`` scores never round-trip to HBM.

Both paths are exact (same argmin, ties broken towards lower index).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def nearest_codebook_indices_xla(
    z: jnp.ndarray, codebook: jnp.ndarray
) -> jnp.ndarray:
    """argmin_k ||z_n - e_k||^2 via one MXU matmul.

    z: [N, D], codebook: [K, D] -> int32 [N].
    """
    # ||z - e||^2 = ||z||^2 - 2 z.e + ||e||^2 ; ||z||^2 constant over k.
    scores = 2.0 * jnp.dot(
        z, codebook.T, preferred_element_type=jnp.float32
    ) - jnp.sum(codebook * codebook, axis=-1)[None, :]
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def _vq_kernel(z_ref, cb_ref, cb_norm_ref, idx_ref):
    """Pallas kernel: one [TILE_N, D] tile of z against the full codebook.

    Keeps the [TILE_N, K] score tile in VMEM (never written to HBM) and emits
    only the argmax indices.
    """
    z = z_ref[:]
    scores = 2.0 * jnp.dot(
        z, cb_ref[:].T, preferred_element_type=jnp.float32
    ) - cb_norm_ref[:]
    idx_ref[:] = jnp.argmax(scores, axis=-1).astype(jnp.int32)


def nearest_codebook_indices_pallas(
    z: jnp.ndarray,
    codebook: jnp.ndarray,
    tile_n: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Tiled Pallas codebook search. Falls back to XLA for shapes that do not
    tile cleanly. ``interpret=True`` runs the kernel through the Pallas
    interpreter (CPU exact-match tests)."""
    n, d = z.shape
    k = codebook.shape[0]
    if n % tile_n != 0:
        # pad N up to a tile boundary; cheap and keeps the kernel simple
        pad = (-n) % tile_n
        z_p = jnp.pad(z, ((0, pad), (0, 0)))
        out = nearest_codebook_indices_pallas(z_p, codebook, tile_n, interpret)
        return out[:n]

    cb_norm = jnp.sum(codebook * codebook, axis=-1)[None, :]  # [1, K]

    return pl.pallas_call(
        _vq_kernel,
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0)),
            pl.BlockSpec((k, d), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_n,), lambda i: (i,)),
        interpret=interpret,
    )(z, codebook, cb_norm)


def nearest_codebook_indices(
    z: jnp.ndarray, codebook: jnp.ndarray, use_pallas: bool = None
) -> jnp.ndarray:
    """Dispatcher. Default is the XLA path everywhere: on-TPU measurement at
    the flagship shape (N=8192, K=512, D=64; datasets/validate_vq_tpu.py,
    2026-08-18) shows XLA at 1019 us vs the Pallas kernel's 1488 us — the
    [N, K] score matrix fits comfortably in cache-friendly tiles at these
    sizes, so XLA's fused matmul+argmax wins. Both paths are exact-matched
    on TPU; pass ``use_pallas=True`` for shapes where the score matrix
    genuinely blows HBM.

    The argmin is piecewise constant in its inputs, so the search is wrapped
    in stop_gradient (also required: pallas_call defines no autodiff rule)."""
    z = jax.lax.stop_gradient(z)
    codebook = jax.lax.stop_gradient(codebook)
    if use_pallas:
        n, d = z.shape
        if n >= 1024 and d % 8 == 0 and codebook.shape[0] % 128 == 0:
            return nearest_codebook_indices_pallas(z, codebook)
    return nearest_codebook_indices_xla(z, codebook)


def vq_straight_through(z: jnp.ndarray, quantized: jnp.ndarray) -> jnp.ndarray:
    """Straight-through estimator: forward value is ``quantized``, gradient
    passes to ``z`` (the reference gets this from haiku's quantizer;
    equivalent to ``z + stop_gradient(q - z)``)."""
    return z + jax.lax.stop_gradient(quantized - z)
