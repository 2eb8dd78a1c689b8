"""PM-VAE on real sklearn digits (64-d flattened 8x8 handwritten digits).

Same shape as the five UCI PM-VAE configs (reference
configs/pm_vae_gas.py etc.) on a REAL dataset that ships with scikit-learn
(datasets/prepare_local.py) — the only real data reachable without network
egress. Gives real NRMSE / AC-LL through eval_pm_vae_uci.py.
"""
from configs._base import uci_pm_vae_config


def get_config():
    config = uci_pm_vae_config(
        "digits_flat",
        event_size=64,
        latent_dim=16,
        train_batch_size=128,
        steps=6000,
        beta={
            "schedule": "cyclic",
            "low_value": 0.0,
            "high_value": 1.0,
            "period": 2000,
            "delay": 0,
        },
    )
    return config
