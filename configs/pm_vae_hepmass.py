"""PM-VAE on UCI Hepmass (reference configs/pm_vae_hepmass.py)."""
from configs._base import uci_pm_vae_config


def get_config():
    return uci_pm_vae_config("hepmass", event_size=21, latent_dim=16)
