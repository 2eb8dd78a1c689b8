"""Lookahead posteriors for active feature acquisition.

TPU-native reimplementation of reference
``posterior_matching/models/lookahead.py``: a single linear head emits one
diagonal-Gaussian "lookahead" posterior per candidate feature
(reference LookaheadBlock, lookahead.py:14-41); training fits those to
one-step-ahead partial-posterior samples of a frozen PM-VAE for a random
subsample of features; ``expected_info_gains`` then estimates every feature's
info gain in ONE forward pass (vs the sampling estimator's O(F) sweep,
reference vae.py:228).

Batched-compute notes vs the reference:
- the S one-step sample passes (reference vmaps ``model_sample`` over S,
  lookahead.py:170-177) collapse into a single partial-encoder forward over
  ``S * B * subsample`` rows;
- lookahead log-probs broadcast ([S, B, s, L] against a [B, s] batch of
  diagonal Gaussians) instead of vmapping.
"""
from __future__ import annotations

from typing import Any, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from posterior_matching_tpu.distributions import (
    MultivariateNormalDiag,
    softplus_scale,
)
from posterior_matching_tpu.models.networks import Dense, get_network
from posterior_matching_tpu.models.vae import PosteriorMatchingVAE
from posterior_matching_tpu.utils import freeze_config, thaw_config


class LookaheadBlock(nn.Module):
    """Linear head -> one diag Gaussian per feature
    (reference lookahead.py:14-41)."""

    event_size: int
    num_features: int

    @nn.compact
    def __call__(self, x) -> MultivariateNormalDiag:
        x = x.reshape((x.shape[0], -1))
        params = Dense(2 * self.event_size * self.num_features)(x)
        params = params.reshape(
            (x.shape[0], self.num_features, 2 * self.event_size)
        )
        loc = params[..., : self.event_size]
        scale = softplus_scale(params[..., self.event_size :])
        return MultivariateNormalDiag(loc=loc, scale_diag=scale)


class LookaheadPosterior(nn.Module):
    """PM-VAE + lookahead encoder (reference lookahead.py:44-227).

    The PM-VAE lives under the ``pm_vae`` param subtree (warm-start it from a
    standalone PM-VAE checkpoint with ``initial_params={'pm_vae': ...}``); the
    lookahead modules carry 'lookahead' in their names for the reference's
    freeze predicate (reference train_lookahead_posterior.py:62-63).
    """

    pm_vae_config: Tuple
    lookahead_encoder_net: str
    lookahead_encoder_net_config: Tuple
    num_features: int
    lookahead_subsample: int = 16
    model_samples: int = 64

    @classmethod
    def from_config(
        cls,
        config: Mapping[str, Any],
        pm_vae_config: Mapping[str, Any],
        name: Optional[str] = None,
    ) -> "LookaheadPosterior":
        return cls(
            pm_vae_config=freeze_config(pm_vae_config),
            lookahead_encoder_net=config.get(
                "lookahead_encoder_net", pm_vae_config["encoder_net"]
            ),
            lookahead_encoder_net_config=freeze_config(
                config.get(
                    "lookahead_encoder_net_config",
                    pm_vae_config.get("encoder_net_config"),
                )
            ),
            num_features=config["num_features"],
            lookahead_subsample=config.get("lookahead_subsample", 16),
            model_samples=config.get("model_samples", 64),
            name=name,
        )

    def setup(self):
        self.pm_vae = PosteriorMatchingVAE.from_config(
            thaw_config(self.pm_vae_config), name="pm_vae"
        )
        self.lookahead_backbone = get_network(
            self.lookahead_encoder_net,
            thaw_config(self.lookahead_encoder_net_config),
            name="lookahead_encoder_net",
        )
        self.lookahead_block = LookaheadBlock(
            event_size=thaw_config(self.pm_vae_config)["latent_dim"],
            num_features=self.num_features,
            name="lookahead_block",
        )

    def lookahead_posteriors(self, x_o_b) -> MultivariateNormalDiag:
        return self.lookahead_block(self.lookahead_backbone(x_o_b))

    def __call__(
        self, x: jnp.ndarray, b: jnp.ndarray, is_training: bool = False
    ) -> jnp.ndarray:
        """Per-instance lookahead training log-likelihood
        (reference lookahead.py:122-202)."""
        s_sub = self.lookahead_subsample
        s_mod = self.model_samples
        batch = x.shape[0]

        x_o = x * b
        x_o_b = jnp.concatenate([x_o, b], axis=-1)

        po_posterior = self.pm_vae.encode_partial(x_o_b, is_training=False)
        z = po_posterior.sample(self.make_rng("sample"), (s_mod,))
        x_u = self.pm_vae._decode_flat(z, 1).mean()  # [S, B, D...]
        x_look = jnp.where(
            jnp.expand_dims(b == 1, 0), jnp.expand_dims(x_o, 0), x_u
        )

        one_hots = jnp.eye(self.num_features).reshape(
            (self.num_features, *b.shape[1:])
        )
        inds = jax.random.choice(
            self.make_rng("sample"),
            self.num_features,
            (s_sub,),
            replace=False,
        )
        sub_one_hots = one_hots[inds]  # [s, D...]

        b_look = jnp.maximum(
            jnp.expand_dims(b, 1), jnp.expand_dims(sub_one_hots, 0)
        )  # [B, s, D...]
        x_o_look = jax.lax.stop_gradient(
            jnp.expand_dims(x_look, 2) * b_look[None]
        )  # [S, B, s, D...]

        valid_mask = (
            jnp.max(
                (jnp.expand_dims(b, 1) + jnp.expand_dims(sub_one_hots, 0)
                 ).reshape(batch, s_sub, -1),
                axis=-1,
            )
            < 2
        )  # [B, s]

        # one giant batched one-step partial-encoder forward
        b_rep = jnp.broadcast_to(
            b_look[None], (s_mod, *b_look.shape)
        )
        inp = jnp.concatenate([x_o_look, b_rep], axis=-1)
        flat = inp.reshape((s_mod * batch * s_sub, *inp.shape[3:]))
        one_step_post = self.pm_vae.encode_partial(flat)
        one_step_z = one_step_post.sample(self.make_rng("sample"))
        one_step_z = one_step_z.reshape((s_mod, batch, s_sub, -1))

        lookahead = self.lookahead_posteriors(x_o_b)  # batch [B, F]
        sub_lookahead = MultivariateNormalDiag(
            loc=lookahead.loc[:, inds],
            scale_diag=lookahead.scale_diag[:, inds],
        )  # batch [B, s]

        lls = sub_lookahead.log_prob(
            jax.lax.stop_gradient(one_step_z)
        )  # [S, B, s]
        lls = jnp.mean(lls, axis=0) * valid_mask

        denom = jnp.count_nonzero(valid_mask, axis=-1)
        out = jnp.sum(lls, axis=-1) / denom
        return jnp.where(denom == 0, 0.0, out)

    def expected_info_gains(self, x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Amortized info gains for ONE instance in one forward pass
        (reference lookahead.py:204-227)."""
        x_o = x * b
        x_o_b = jnp.concatenate([x_o, b], axis=-1)

        current_ent = self.pm_vae.encode(jnp.expand_dims(x, 0)).entropy()
        lookahead_ents = self.lookahead_posteriors(
            jnp.expand_dims(x_o_b, 0)
        ).entropy()

        info_gains = jnp.reshape(current_ent - lookahead_ents, b.shape)
        info_gains = jnp.where(b == 0, info_gains, -jnp.inf)
        return jnp.reshape(info_gains, (-1,))

    # -- passthroughs for the acquisition engine --------------------------------

    def sampling_info_gains(self, x_o, b, num_samples: int = 100):
        return self.pm_vae.expected_info_gains(x_o, b, num_samples)

    def impute(self, x_o, b, num_samples: int = 100):
        return self.pm_vae.impute(x_o, b, num_samples)
