"""Lookahead posterior on a frozen 16x16-MNIST PM-VAE
(reference configs/lookahead_mnist16.py)."""
from configs._base import config_from


def get_config():
    return config_from(
        {
            "data": {
                "dataset": "mnist16",
                "train_split": "train",
                "validation_split": "test",
                "train_batch_size": 32,
                "val_batch_size": 32,
                "mask_generator": "UniformMaskGenerator",
                "mask_generator_kwargs": {"bounds": (0.0, 0.20)},
            },
            # Replace with your own run dir from train_pm_vae.py.
            "pm_vae_dir": "runs/pm-vae-mnist16",
            "model": {
                "lookahead_subsample": 16,
                "model_samples": 64,
            },
            "steps": 40000,
            "validation_freq": 5000,
            "lr_schedule": {
                "init_value": 0.001,
                "decay_rate": 0.9,
                "transition_steps": 5000,
            },
        }
    )
