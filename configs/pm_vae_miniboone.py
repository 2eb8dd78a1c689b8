"""PM-VAE on UCI Miniboone (reference configs/pm_vae_miniboone.py)."""
from configs._base import uci_pm_vae_config


def get_config():
    return uci_pm_vae_config(
        "miniboone",
        event_size=43,
        latent_dim=32,
        train_batch_size=1024,
        encoder_blocks=5,
        decoder_blocks=2,
        layer_norm=True,
        dropout=0.5,
        beta={
            "schedule": "cyclic",
            "low_value": 0.0,
            "high_value": 1.0,
            "period": 5000,
            "delay": 2000,
        },
        steps=22000,
        lr_transition_steps=1000,
    )
