"""Backbone networks (flax.linen).

Functional equivalents of the reference's haiku networks
(``posterior_matching/models/networks.py``): same layer structure, padding
rules and activations, re-expressed as linen modules. Conv layouts are NHWC
(TPU-native); all matmuls/convs go through the MXU.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _trunc_normal_fan_in(key, shape, dtype=jnp.float32):
    """Truncated-normal init with stddev 1/sqrt(fan_in), the haiku default
    used throughout the reference (e.g. reference pixel_cnn.py:180-182)."""
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    stddev = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


Dense = lambda features, **kw: nn.Dense(
    features, kernel_init=kw.pop("kernel_init", _trunc_normal_fan_in), **kw
)


class ConvEncoder(nn.Module):
    """Stack of strided convs; VALID padding on the final layer, leaky-relu
    after every layer (reference networks.py:9-38)."""

    conv_layers: Sequence[Tuple[int, int, int]]

    @nn.compact
    def __call__(self, x, is_training: bool = False):
        assert x.ndim == 4, f"expected rank-4 input, got {x.shape}"
        h = x
        n = len(self.conv_layers)
        for i, (filters, kernel, stride) in enumerate(self.conv_layers):
            h = nn.Conv(
                filters,
                (kernel, kernel),
                strides=(stride, stride),
                padding="VALID" if i == n - 1 else "SAME",
                kernel_init=_trunc_normal_fan_in,
            )(h)
            h = jax.nn.leaky_relu(h)
        return h


class ConvDecoder(nn.Module):
    """Stack of transposed convs from a [B, Z] latent; VALID padding on the
    first layer, leaky-relu after every layer (reference networks.py:41-72)."""

    conv_layers: Sequence[Tuple[int, int, int]]

    @nn.compact
    def __call__(self, x, is_training: bool = False):
        assert x.ndim == 2, f"expected rank-2 input, got {x.shape}"
        h = x[:, None, None, :]
        for i, (filters, kernel, stride) in enumerate(self.conv_layers):
            h = nn.ConvTranspose(
                filters,
                (kernel, kernel),
                strides=(stride, stride),
                padding="VALID" if i == 0 else "SAME",
                kernel_init=_trunc_normal_fan_in,
            )(h)
            h = jax.nn.leaky_relu(h)
        return h


class ResidualMLP(nn.Module):
    """MLP with residual blocks, optional LayerNorm (no scale/offset) and
    dropout (reference networks.py:75-135)."""

    residual_blocks: int = 2
    hidden_units: int = 256
    activation: Callable = jax.nn.relu
    activate_final: bool = True
    dropout: float = 0.0
    layer_norm: bool = False

    @nn.compact
    def __call__(self, x, is_training: bool = False):
        assert x.ndim == 2, f"expected rank-2 input, got {x.shape}"
        ln = lambda h: (
            nn.LayerNorm(use_bias=False, use_scale=False)(h)
            if self.layer_norm
            else h
        )
        drop = nn.Dropout(self.dropout, deterministic=not is_training)

        h = ln(Dense(self.hidden_units)(x))
        for _ in range(self.residual_blocks):
            res = self.activation(h)
            res = ln(Dense(self.hidden_units)(res))
            res = self.activation(res)
            res = drop(res)
            res = ln(Dense(self.hidden_units)(res))
            h = h + res
        if self.activate_final:
            h = self.activation(h)
        return h


_NETWORKS = {
    "ConvEncoder": ConvEncoder,
    "ConvDecoder": ConvDecoder,
    "ResidualMLP": ResidualMLP,
}


def _normalize_net_config(network_type: str, cfg: Dict[str, Any]) -> Dict[str, Any]:
    cfg = dict(cfg or {})
    if "conv_layers" in cfg:
        cfg["conv_layers"] = tuple(tuple(layer) for layer in cfg["conv_layers"])
    return cfg


def get_network(
    network_type: str,
    network_config: Optional[Dict[str, Any]] = None,
    name: Optional[str] = None,
) -> nn.Module:
    """Network factory keyed by the reference's registry names
    (reference networks.py:138-162)."""
    cfg = _normalize_net_config(network_type, network_config)
    return _NETWORKS[network_type](**cfg, name=name)


# ---------------------------------------------------------------------------
# Pure (explicit-params) MLP: used where a network must live *inside* a
# returned distribution pytree (AutoregressiveGMM) so it can be applied under
# vmap/scan/fori_loop without threading a module scope around.
# ---------------------------------------------------------------------------


def pure_residual_mlp_params(
    module: nn.Module, in_dim: int, hidden_units: int, residual_blocks: int,
    out_dim: int, name: str,
):
    """Creates the parameters of a ResidualMLP + output Dense inside `module`
    (via ``module.param``) and returns them as a plain pytree."""

    def dense_params(pname, nin, nout):
        w = module.param(
            f"{name}_{pname}_w", _trunc_normal_fan_in, (nin, nout)
        )
        b = module.param(
            f"{name}_{pname}_b", nn.initializers.zeros, (nout,)
        )
        return {"w": w, "b": b}

    params = {"in": dense_params("in", in_dim, hidden_units), "blocks": []}
    for i in range(residual_blocks):
        params["blocks"].append(
            {
                "a": dense_params(f"block{i}_a", hidden_units, hidden_units),
                "b": dense_params(f"block{i}_b", hidden_units, hidden_units),
            }
        )
    params["out"] = dense_params("out", hidden_units, out_dim)
    return params


def pure_residual_mlp_apply(params, x: jnp.ndarray) -> jnp.ndarray:
    """Applies the pure ResidualMLP (relu activations, activate_final=True,
    matching the net built inside the reference's AutoregressiveGMM,
    reference distributions.py:216-221) followed by the output Dense."""
    dense = lambda p, h: h @ p["w"] + p["b"]
    h = dense(params["in"], x)
    for blk in params["blocks"]:
        res = jax.nn.relu(h)
        res = dense(blk["a"], res)
        res = jax.nn.relu(res)
        res = dense(blk["b"], res)
        h = h + res
    h = jax.nn.relu(h)
    return dense(params["out"], h)
