"""PM-VAE on UCI Power (reference configs/pm_vae_power.py)."""
from configs._base import uci_pm_vae_config


def get_config():
    return uci_pm_vae_config("power", event_size=6, latent_dim=16)
