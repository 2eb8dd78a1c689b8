"""Lookahead posterior on a frozen real-digits PM-VAE.

The reference's amortized info-gain stage (reference
configs/lookahead_mnist16.py, train_lookahead_posterior.py) on the REAL
sklearn digits features (datasets/prepare_local.py): train only the
lookahead head against the frozen PM-VAE from configs/pm_vae_digits.py,
then drive eval_greedy_acquisition.py for real acquisition trajectories.
"""
from configs._base import config_from


def get_config():
    return config_from(
        {
            "data": {
                "dataset": "digits_flat",
                "train_split": "train",
                "validation_split": "val",
                "train_batch_size": 64,
                "val_batch_size": 64,
                "mask_generator": "UniformMaskGenerator",
                "mask_generator_kwargs": {"bounds": (0.0, 0.20)},
            },
            # Replace with your own run dir from train_pm_vae.py.
            "pm_vae_dir": "runs/pm-vae-digits_flat",
            "model": {
                "lookahead_subsample": 16,
                "model_samples": 64,
            },
            "steps": 6000,
            "validation_freq": 1000,
            "lr_schedule": {
                "init_value": 0.001,
                "decay_rate": 0.9,
                "transition_steps": 1000,
            },
        }
    )
