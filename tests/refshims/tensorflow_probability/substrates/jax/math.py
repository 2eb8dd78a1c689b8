"""Shim of tfp.substrates.jax.math — see tests/refshims/README.md."""
import jax
import jax.numpy as jnp


def reduce_logmeanexp(x, axis=None, keepdims=False):
    lse = jax.scipy.special.logsumexp(x, axis=axis, keepdims=keepdims)
    if axis is None:
        n = x.size
    else:
        axes = (axis,) if isinstance(axis, int) else tuple(axis)
        n = 1
        for a in axes:
            n *= x.shape[a]
    return lse - jnp.log(float(n))
