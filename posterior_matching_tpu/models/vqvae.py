"""VQ-VAE ("Neural Discrete Representation Learning") + PM partial encoder.

TPU-native reimplementation of reference ``posterior_matching/models/vqvae.py``.
The codebook quantizer is our own (the reference uses
``hk.nets.VectorQuantizerEMA``, reference vqvae.py:66-76): nearest-neighbor
search runs through :mod:`posterior_matching_tpu.ops.vq` (one MXU matmul /
Pallas-tiled), the straight-through estimator is explicit, and the EMA
codebook statistics live in a ``vq_ema`` flax variable collection.

Cross-replica semantics: the reference exposes a ``cross_replica_axis`` knob
for pmap (reference vqvae.py:43, never enabled by any config). Under our
jit-over-mesh data parallelism the EMA statistics are *defined* over the
global batch — XLA inserts the ICI all-reduce automatically — so the knob
disappears: multi-chip EMA is always exact.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from posterior_matching_tpu.distributions import Normal
from posterior_matching_tpu.models.networks import Dense, _trunc_normal_fan_in
from posterior_matching_tpu.ops.vq import (
    nearest_codebook_indices,
    vq_straight_through,
)


class VectorQuantizer(nn.Module):
    """Codebook quantizer with EMA (default) or loss-based codebook learning.

    Matches the training semantics of haiku's VectorQuantizer(EMA): commitment
    loss ``commitment_cost * ||sg(q) - z||^2``; EMA cluster counts/sums with
    Laplace smoothing; straight-through gradients.
    """

    embedding_dim: int
    num_embeddings: int
    commitment_cost: float = 0.25
    decay: float = 0.99
    use_ema: bool = True
    epsilon: float = 1e-5

    def setup(self):
        init = nn.initializers.variance_scaling(
            1.0, "fan_in", "uniform", in_axis=-1, out_axis=-2
        )
        shape = (self.num_embeddings, self.embedding_dim)
        if self.use_ema:
            self._embeddings = self.variable(
                "vq_ema",
                "embeddings",
                lambda: init(self.make_rng("params"), shape),
            )
            self._ema_cluster_size = self.variable(
                "vq_ema", "ema_cluster_size",
                lambda: jnp.zeros((self.num_embeddings,)),
            )
            self._ema_dw = self.variable(
                "vq_ema", "ema_dw", lambda: jnp.zeros(shape)
            )
        else:
            self._embeddings_p = self.param("embeddings", init, shape)

    @property
    def embeddings(self) -> jnp.ndarray:
        if self.use_ema:
            return self._embeddings.value
        return self._embeddings_p

    def __call__(
        self, z: jnp.ndarray, is_training: bool = False
    ) -> Dict[str, Any]:
        flat = z.reshape((-1, self.embedding_dim))
        embeddings = self.embeddings
        indices = nearest_codebook_indices(flat, embeddings)
        quantized_flat = jnp.take(embeddings, indices, axis=0)
        quantized = quantized_flat.reshape(z.shape)

        e_latent_loss = jnp.mean(
            (jax.lax.stop_gradient(quantized) - z) ** 2
        )

        if self.use_ema:
            loss = self.commitment_cost * e_latent_loss
            if is_training and not self.is_initializing():
                one_hot = jax.nn.one_hot(
                    indices, self.num_embeddings, dtype=flat.dtype
                )
                counts = jnp.sum(one_hot, axis=0)
                dw = jnp.dot(
                    one_hot.T, flat, preferred_element_type=jnp.float32
                )
                new_cluster = (
                    self.decay * self._ema_cluster_size.value
                    + (1.0 - self.decay) * counts
                )
                new_dw = self.decay * self._ema_dw.value + (
                    1.0 - self.decay
                ) * dw
                n = jnp.sum(new_cluster)
                stable = (
                    (new_cluster + self.epsilon)
                    / (n + self.num_embeddings * self.epsilon)
                    * n
                )
                self._ema_cluster_size.value = new_cluster
                self._ema_dw.value = new_dw
                self._embeddings.value = new_dw / stable[:, None]
        else:
            q_latent_loss = jnp.mean(
                (quantized - jax.lax.stop_gradient(z)) ** 2
            )
            loss = q_latent_loss + self.commitment_cost * e_latent_loss

        quantize_st = vq_straight_through(z, quantized)

        avg_probs = jnp.mean(
            jax.nn.one_hot(indices, self.num_embeddings, dtype=jnp.float32),
            axis=0,
        )
        perplexity = jnp.exp(
            -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10))
        )

        return {
            "quantize": quantize_st,
            "loss": loss,
            "perplexity": perplexity,
            "encoding_indices": indices.reshape(z.shape[:-1]),
        }

    def quantize(self, encoding_indices: jnp.ndarray) -> jnp.ndarray:
        """Looks up codebook vectors for integer indices (reference usage:
        ``vq.quantize(samples)`` in vqvae_impute, reference vqvae.py:302)."""
        return jnp.take(self.embeddings, encoding_indices, axis=0)


class ConvResidualStack(nn.Module):
    """relu -> 3x3 conv -> relu -> 1x1 conv residual blocks
    (reference vqvae.py:133-174)."""

    hidden_units: int
    residual_blocks: int
    residual_hidden_units: int
    activate_final: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.residual_blocks):
            r = nn.Conv(
                self.residual_hidden_units, (3, 3),
                kernel_init=_trunc_normal_fan_in, dtype=self.dtype,
                name=f"res3x3_{i}",
            )(jax.nn.relu(h))
            r = nn.Conv(
                self.hidden_units, (1, 1),
                kernel_init=_trunc_normal_fan_in, dtype=self.dtype,
                name=f"res1x1_{i}",
            )(jax.nn.relu(r))
            h = h + r
        if self.activate_final:
            h = jax.nn.relu(h)
        return h


class ConvResidualEncoder(nn.Module):
    """Two stride-2 4x4 convs + 3x3 conv + residual stack
    (reference vqvae.py:177-210): downsamples by 4x."""

    hidden_units: int
    residual_blocks: int
    residual_hidden_units: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(
            nn.Conv(
                self.hidden_units // 2, (4, 4), strides=(2, 2),
                kernel_init=_trunc_normal_fan_in, dtype=self.dtype,
                name="enc_1",
            )(x)
        )
        h = jax.nn.relu(
            nn.Conv(
                self.hidden_units, (4, 4), strides=(2, 2),
                kernel_init=_trunc_normal_fan_in, dtype=self.dtype,
                name="enc_2",
            )(h)
        )
        h = jax.nn.relu(
            nn.Conv(
                self.hidden_units, (3, 3),
                kernel_init=_trunc_normal_fan_in, dtype=self.dtype,
                name="enc_3",
            )(h)
        )
        return ConvResidualStack(
            self.hidden_units, self.residual_blocks,
            self.residual_hidden_units, dtype=self.dtype,
        )(h)


class ConvResidualDecoder(nn.Module):
    """3x3 conv + residual stack + two stride-2 transposed convs, emitting a
    Normal with learned scalar log-scale (reference vqvae.py:213-266)."""

    hidden_units: int
    residual_blocks: int
    residual_hidden_units: int
    output_channels: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, z, scale: Optional[jnp.ndarray] = None) -> Normal:
        h = nn.Conv(
            self.hidden_units, (3, 3),
            kernel_init=_trunc_normal_fan_in, dtype=self.dtype, name="dec_1",
        )(z)
        h = ConvResidualStack(
            self.hidden_units, self.residual_blocks,
            self.residual_hidden_units, dtype=self.dtype,
        )(h)
        h = jax.nn.relu(
            nn.ConvTranspose(
                self.hidden_units // 2, (4, 4), strides=(2, 2),
                kernel_init=_trunc_normal_fan_in, dtype=self.dtype,
                name="dec_2",
            )(h)
        )
        # final conv left at dtype=None so the f32 params promote the output
        # location back to float32 for the Normal head
        loc = nn.ConvTranspose(
            self.output_channels, (4, 4), strides=(2, 2),
            kernel_init=_trunc_normal_fan_in, name="dec_3",
        )(h)
        if scale is None:
            log_scale = self.param(
                "log_scale", nn.initializers.zeros, ()
            )
            scale = jnp.exp(log_scale) + 1e-5
        return Normal(loc=loc, scale=jnp.broadcast_to(scale, loc.shape))


class VQVAE(nn.Module):
    """The full VQ-VAE (reference vqvae.py:13-96)."""

    output_channels: int = 3
    embedding_dim: int = 64
    num_embeddings: int = 512
    hidden_units: int = 128
    residual_blocks: int = 2
    residual_hidden_units: int = 128
    decay: float = 0.99
    commitment_cost: float = 0.25
    use_ema: bool = True
    # Compute dtype for the conv stacks (params stay float32). The quantizer,
    # EMA statistics and distribution heads always run in float32: the
    # pre-VQ 1x1 conv and the decoder's final transpose conv are left at
    # dtype=None so their f32 params promote activations back up.
    compute_dtype: Optional[str] = None

    def setup(self):
        cdtype = (
            jnp.dtype(self.compute_dtype)
            if self.compute_dtype is not None
            else None
        )
        self.encoder_stack = ConvResidualEncoder(
            self.hidden_units, self.residual_blocks,
            self.residual_hidden_units, dtype=cdtype, name="encoder",
        )
        self.pre_vq_conv = nn.Conv(
            self.embedding_dim, (1, 1),
            kernel_init=_trunc_normal_fan_in, name="pre_vq_conv",
        )
        self.vq = VectorQuantizer(
            embedding_dim=self.embedding_dim,
            num_embeddings=self.num_embeddings,
            commitment_cost=self.commitment_cost,
            decay=self.decay,
            use_ema=self.use_ema,
            name="vq",
        )
        self.decoder = ConvResidualDecoder(
            self.hidden_units, self.residual_blocks,
            self.residual_hidden_units, self.output_channels,
            dtype=cdtype, name="decoder",
        )

    def encode(self, inputs: jnp.ndarray) -> jnp.ndarray:
        return self.pre_vq_conv(self.encoder_stack(inputs))

    def __call__(
        self, inputs: jnp.ndarray, is_training: bool = False
    ) -> Dict[str, Any]:
        z = self.encode(inputs)
        vq_output = self.vq(z, is_training=is_training)
        decoder_dist = self.decoder(vq_output["quantize"])

        lp = decoder_dist.log_prob(inputs)
        reconstruction_loss = -jnp.mean(
            jnp.sum(lp, axis=tuple(range(1, lp.ndim)))
        )
        loss = reconstruction_loss + vq_output["loss"]

        return {
            "loss": loss,
            "vq_output": vq_output,
            "z": z,
            "reconstruction": decoder_dist.mean(),
            "reconstruction_loss": reconstruction_loss,
            "decoder_dist": decoder_dist,
        }

    def encoding_indices(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """Inference path: image -> discrete code grid (no EMA updates)."""
        return self.vq(self.encode(inputs))["encoding_indices"]

    def decode_indices(self, encoding_indices: jnp.ndarray) -> jnp.ndarray:
        """Discrete code grid -> decoder mean image."""
        return self.decoder(self.vq.quantize(encoding_indices)).mean()


class VQVAEPartialEncoder(nn.Module):
    """Partial encoder: masked image + mask -> conditioning vector
    (reference vqvae.py:99-130)."""

    conditional_dim: int
    hidden_units: int
    residual_blocks: int
    residual_hidden_units: int
    compute_dtype: Optional[str] = None

    @classmethod
    def from_vqvae_config(cls, conditional_dim: int, vqvae_config: Dict,
                          name: Optional[str] = None):
        return cls(
            conditional_dim=conditional_dim,
            hidden_units=vqvae_config["hidden_units"],
            residual_blocks=vqvae_config["residual_blocks"],
            residual_hidden_units=vqvae_config["residual_hidden_units"],
            compute_dtype=vqvae_config.get("compute_dtype"),
            name=name,
        )

    @nn.compact
    def __call__(self, x_o_b: jnp.ndarray) -> jnp.ndarray:
        cdtype = (
            jnp.dtype(self.compute_dtype)
            if self.compute_dtype is not None
            else None
        )
        h = ConvResidualEncoder(
            self.hidden_units, self.residual_blocks,
            self.residual_hidden_units, dtype=cdtype,
        )(x_o_b)
        h = h.reshape((h.shape[0], -1))
        # f32 Dense params promote the conditioning vector back to float32
        return Dense(self.conditional_dim)(h)
