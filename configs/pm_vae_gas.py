"""PM-VAE on UCI Gas (reference configs/pm_vae_gas.py)."""
from configs._base import uci_pm_vae_config


def get_config():
    return uci_pm_vae_config("gas", event_size=8, latent_dim=16)
