"""Helpers for config files.

Every config module exports ``get_config() -> ml_collections.ConfigDict``,
drop-in compatible with the reference's configs (same keys, same
hyperparameters — see reference ``configs/``). Configs here are written as
plain dict literals and converted, which keeps them terse and serializable.
"""
from ml_collections import ConfigDict, config_dict


def config_from(d: dict) -> ConfigDict:
    def conv(v):
        if isinstance(v, dict):
            return ConfigDict({k: conv(x) for k, x in v.items()})
        return v

    d = dict(d)
    # Execution knobs available (and CLI-overridable) on every config:
    # fuse K optimizer steps per dispatched XLA program, and keep training
    # data HBM-resident with on-device batch gather (see train/trainer.py).
    d.setdefault("steps_per_call", 1)
    d.setdefault("device_resident_data", False)
    out = ConfigDict({k: conv(v) for k, v in d.items()})
    # CLI-settable seed (``--config.seed N``); the train scripts draw a
    # random one when left unset, matching the reference
    # (reference train_pm_vae.py:49-50).
    if "seed" not in out:
        out.seed = config_dict.placeholder(int)
    return out


def uci_pm_vae_config(
    dataset: str,
    event_size: int,
    latent_dim: int,
    *,
    train_batch_size: int = 512,
    encoder_blocks: int = 2,
    decoder_blocks: int = 2,
    layer_norm: bool = False,
    dropout: float = None,
    beta: dict = None,
    steps: int = 200000,
    lr_transition_steps: int = 5000,
) -> ConfigDict:
    """Shared shape of the five UCI PM-VAE configs (reference
    configs/pm_vae_{gas,power,hepmass,miniboone,bsds}.py — identical modulo
    dims/depths/beta schedules)."""
    enc = {
        "residual_blocks": encoder_blocks,
        "hidden_units": 256,
        "layer_norm": layer_norm,
    }
    dec = {
        "residual_blocks": decoder_blocks,
        "hidden_units": 256,
        "layer_norm": layer_norm,
    }
    if dropout is not None:
        enc["dropout"] = dropout
        dec["dropout"] = dropout
    return config_from(
        {
            "data": {
                "dataset": dataset,
                "train_split": "train",
                "validation_split": "val",
                "train_batch_size": train_batch_size,
                "val_batch_size": train_batch_size,
                "training_noise": 0.001,
                "mask_generator": "BernoulliMaskGenerator",
            },
            "model": {
                "latent_dim": latent_dim,
                "encoder_net": "ResidualMLP",
                "decoder_net": "ResidualMLP",
                "decoder_dist": "IdentityGaussian",
                "posterior_dist": "TriLGaussian",
                "decoder_dist_config": {"event_size": event_size},
                # NOTE: carried for parity with the reference configs, but
                # (exactly as in the reference, see reference vae.py:103-107)
                # these keys are ignored by the model builder.
                "masked_posterior_dist": "AutoregressiveGMM",
                "masked_posterior_config": {
                    "hidden_units": 256,
                    "residual_blocks": 3,
                },
                "encoder_net_config": enc,
                "decoder_net_config": dec,
                "matching_ll_stop_gradients": True,
            },
            "beta": beta
            or {
                "schedule": "cyclic",
                "low_value": 0.0,
                "high_value": 1.0,
                "period": 50000,
                "delay": 1000,
            },
            "steps": steps,
            "validation_freq": 1000,
            "save_final_state": True,
            "weight_decay": 0.00001,
            "lr_schedule": {
                "init_value": 0.001,
                "decay_rate": 0.9,
                "transition_steps": lr_transition_steps,
            },
        }
    )
