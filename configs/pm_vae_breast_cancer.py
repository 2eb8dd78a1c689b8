"""PM-VAE on the real UCI breast_cancer table (30 standardized features).

Real diagnostic measurements shipped inside scikit-learn
(datasets/prepare_local.py) — same pipeline shape as the reference's
miniboone config (43-d; reference configs/pm_vae_miniboone.py).
"""
from configs._base import uci_pm_vae_config


def get_config():
    return uci_pm_vae_config(
        "breast_cancer",
        event_size=30,
        latent_dim=12,
        train_batch_size=128,
        steps=5000,
        beta={
            "schedule": "cyclic",
            "low_value": 0.0,
            "high_value": 1.0,
            "period": 1500,
            "delay": 0,
        },
    )
