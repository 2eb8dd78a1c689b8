"""PM-VAE on the real UCI wine table (13 standardized features).

A genuinely real UCI table shipped inside scikit-learn
(datasets/prepare_local.py) — same pipeline shape as the reference's
gas/power/hepmass/miniboone configs (reference configs/pm_vae_gas.py).
"""
from configs._base import uci_pm_vae_config


def get_config():
    return uci_pm_vae_config(
        "wine",
        event_size=13,
        latent_dim=8,
        train_batch_size=64,
        # 2,000 steps: on this 142-row train split, test AC-LL collapses an
        # order of magnitude per 2k steps past ~2k (measured for BOTH this
        # framework and the reference implementation — BASELINE.md "Wine
        # AC-LL step sensitivity") while NRMSE stays flat; 4k+ trains deep
        # into that cliff.
        steps=2000,
        beta={
            "schedule": "cyclic",
            "low_value": 0.0,
            "high_value": 1.0,
            "period": 1000,
            "delay": 0,
        },
    )
