"""Variational Deep Embedding (VaDE) + Posterior-Matching variant.

TPU-native reimplementation of reference ``posterior_matching/models/vade.py``:
a VAE with a learnable GMM prior over the latent space (logits / mu /
log_scale as parameters, reference vade.py:40-58), soft cluster
responsibilities via a single batched log-prob broadcast (the reference vmaps
per-component log_probs), and a PM variant adding a partial encoder trained
with the stop-gradient matching loss (reference vade.py:246-265).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from posterior_matching_tpu.distributions import MultivariateNormalDiag
from posterior_matching_tpu.models.heads import (
    DiagonalGaussianHead,
    get_distribution,
)
from posterior_matching_tpu.models.networks import get_network
from posterior_matching_tpu.utils import (
    freeze_config,
    sum_over_event,
    thaw_config,
)


class VADE(nn.Module):
    """See module docstring. Build via :meth:`from_config`."""

    num_components: int
    latent_dim: int
    encoder_net: str
    encoder_net_config: Tuple
    decoder_net: str
    decoder_net_config: Tuple
    decoder_dist: str
    decoder_dist_config: Tuple

    @classmethod
    def from_config(cls, config: Mapping[str, Any], **kwargs) -> "VADE":
        return cls(
            num_components=config["num_components"],
            latent_dim=config["latent_dim"],
            encoder_net=config["encoder_net"],
            encoder_net_config=freeze_config(config.get("encoder_net_config")),
            decoder_net=config["decoder_net"],
            decoder_net_config=freeze_config(config.get("decoder_net_config")),
            decoder_dist=config["decoder_dist"],
            decoder_dist_config=freeze_config(
                config.get("decoder_dist_config")
            ),
            **kwargs,
        )

    def setup(self):
        self.gmm_logits = self.param(
            "logits", nn.initializers.zeros, (self.num_components,)
        )
        self.gmm_mu = self.param(
            "mu", nn.initializers.normal(1.0),
            (self.num_components, self.latent_dim),
        )
        self.gmm_log_scale = self.param(
            "log_scale", nn.initializers.normal(1.0),
            (self.num_components, self.latent_dim),
        )
        self.encoder_backbone = get_network(
            self.encoder_net, thaw_config(self.encoder_net_config),
            name="encoder_net",
        )
        self.posterior_head = DiagonalGaussianHead(
            self.latent_dim, name="posterior_dist"
        )
        self.decoder_backbone = get_network(
            self.decoder_net, thaw_config(self.decoder_net_config),
            name="decoder_net",
        )
        self.decoder_head = get_distribution(
            self.decoder_dist, thaw_config(self.decoder_dist_config),
            name="decoder_dist",
        )
        self._setup_extra()

    def _setup_extra(self):
        pass

    # -- pieces ----------------------------------------------------------------

    def encode(self, x, is_training: bool = False) -> MultivariateNormalDiag:
        return self.posterior_head(
            self.encoder_backbone(x, is_training=is_training)
        )

    def decode(self, z, is_training: bool = False):
        return self.decoder_head(
            self.decoder_backbone(z, is_training=is_training)
        )

    def decode_log_prob(self, z, x) -> jnp.ndarray:
        """Independent-decoder log p(x|z), summed over event dims
        (the reference wraps the decoder dist in Independent,
        vade.py:63-65)."""
        return sum_over_event(self.decode(z).log_prob(x))

    def log_p_z_given_c(self, z: jnp.ndarray) -> jnp.ndarray:
        """[..., L] latents -> [..., K] per-component log densities, one
        broadcast log-prob instead of the reference's nested vmaps
        (reference vade.py:109,128)."""
        comp = MultivariateNormalDiag(
            loc=self.gmm_mu, scale_diag=jnp.exp(self.gmm_log_scale)
        )
        return comp.log_prob(z[..., None, :])

    def log_pi(self) -> jnp.ndarray:
        return jax.nn.log_softmax(self.gmm_logits)

    # -- public API (mirrors reference vade.py) ---------------------------------

    def pretrain_loss(self, x) -> jnp.ndarray:
        """Deterministic-autoencoder pretraining loss (reference
        train_vade.py:45-49)."""
        z = self.encode(x).mean()
        return -jnp.mean(self.decode_log_prob(z, x))

    def encode_mean(self, x) -> jnp.ndarray:
        return self.encode(x).mean()

    def predict_cluster(self, x, num_samples: int = 10) -> jnp.ndarray:
        """Cluster responsibilities q(c|x), averaged over posterior samples
        (reference vade.py:96-112)."""
        posterior = self.encode(x)
        z = posterior.sample(self.make_rng("sample"), (num_samples,))
        h = self.log_p_z_given_c(z) + self.log_pi()
        return jnp.mean(jax.nn.softmax(h, axis=-1), axis=0)

    def elbo(self, x) -> jnp.ndarray:
        """The VaDE evidence lower bound (reference vade.py:114-147)."""
        posterior = self.encode(x)
        z = posterior.sample(self.make_rng("sample"))

        log_p_x_given_z = self.decode_log_prob(z, x)
        log_p_z_given_c = self.log_p_z_given_c(z)  # [B, K]
        # Reference QUIRK (vade.py:128-139): the prior term uses the RAW
        # mixture logits, not log_softmax — e_log_p_c is unnormalized, which
        # shifts the ELBO by logsumexp(logits) AND changes the gradient wrt
        # the logits (training dynamics). Reproduce the behavior, not the
        # intent; log_q_c_given_x is invariant to the choice.
        logits = self.gmm_logits

        unnorm = log_p_z_given_c + logits[None]
        log_q_c_given_x = jax.nn.log_softmax(unnorm, axis=-1)
        gamma = jnp.exp(log_q_c_given_x)

        e_log_p_z_given_c = jnp.sum(gamma * log_p_z_given_c, axis=-1)
        e_log_p_c = jnp.sum(gamma * logits[None], axis=-1)
        e_log_q_c_given_x = jnp.sum(gamma * log_q_c_given_x, axis=-1)
        log_q_z_given_x = posterior.log_prob(z)

        return (
            log_p_x_given_z
            + e_log_p_z_given_c
            + e_log_p_c
            - log_q_z_given_x
            - e_log_q_c_given_x
        )


class PosteriorMatchingVADE(VADE):
    """VaDE + partial encoder for partially observed clustering
    (reference vade.py:150-265)."""

    partial_encoder_net: str = ""
    partial_encoder_net_config: Tuple = ()
    partial_posterior_dist: str = "TriLGaussian"
    partial_posterior_dist_config: Tuple = ()

    @classmethod
    def from_config(cls, config: Mapping[str, Any]) -> "PosteriorMatchingVADE":
        partial_cfg = dict(config.get("partial_posterior_dist_config") or {})
        partial_cfg["event_size"] = config["latent_dim"]
        return super().from_config(
            config,
            partial_encoder_net=config.get(
                "partial_encoder_net", config["encoder_net"]
            ),
            partial_encoder_net_config=freeze_config(
                config.get(
                    "partial_encoder_net_config",
                    config.get("encoder_net_config"),
                )
            ),
            partial_posterior_dist=config.get(
                "partial_posterior_dist", "TriLGaussian"
            ),
            partial_posterior_dist_config=freeze_config(partial_cfg),
        )

    def _setup_extra(self):
        self.partial_encoder_backbone = get_network(
            self.partial_encoder_net,
            thaw_config(self.partial_encoder_net_config),
            name="partial_encoder_net",
        )
        self.partial_posterior_head = get_distribution(
            self.partial_posterior_dist,
            thaw_config(self.partial_posterior_dist_config),
            name="partial_posterior_dist",
        )

    def encode_partial(self, x_o_b, is_training: bool = False):
        return self.partial_posterior_head(
            self.partial_encoder_backbone(x_o_b, is_training=is_training)
        )

    def partial_predict_cluster(
        self, x, b, num_samples: int = 10
    ) -> jnp.ndarray:
        """q(c|x_o) from the partial encoder (reference vade.py:224-244)."""
        x_o_b = jnp.concatenate([x * b, b], axis=-1)
        partial_posterior = self.encode_partial(x_o_b)
        z = partial_posterior.sample(self.make_rng("sample"), (num_samples,))
        h = self.log_p_z_given_c(z) + self.log_pi()
        return jnp.mean(jax.nn.softmax(h, axis=-1), axis=0)

    def posterior_matching_ll(self, x, b) -> jnp.ndarray:
        """log q(z|x_o) on stop-gradient z ~ q(z|x)
        (reference vade.py:246-265)."""
        x_o = x * b
        x_o_b = jnp.concatenate([x_o, b], axis=-1)
        posterior = self.encode(x)
        partial_posterior = self.encode_partial(x_o_b)
        z = posterior.sample(self.make_rng("sample"))
        return partial_posterior.log_prob(jax.lax.stop_gradient(z))
