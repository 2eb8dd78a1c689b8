"""PM-VAE on UCI BSDS (reference configs/pm_vae_bsds.py)."""
from configs._base import uci_pm_vae_config


def get_config():
    return uci_pm_vae_config(
        "bsds",
        event_size=63,
        latent_dim=64,
        encoder_blocks=5,
        decoder_blocks=5,
        layer_norm=True,
        beta={
            "schedule": "monotonic",
            "low_value": 0.0,
            "high_value": 1.0,
            "transition_steps": 200000,
            "transition_begin": 30000,
        },
    )
