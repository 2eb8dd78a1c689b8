"""Stage-2 PM-VQVAE on real sklearn digits resized to 16x16.

The flagship pipeline (conditional PixelCNN + partial encoder over a frozen
VQ-VAE, reference train_pm_vqvae.py) on REAL images: 4x4 code grid over the
16x16 digits from datasets/prepare_local.py. Gives real imputation PSNR and
PRD through eval_pm_vqvae.py.
"""
from ml_collections import config_dict

from configs._base import config_from


def get_config():
    return config_from(
        {
            "data": {
                "dataset": "digits16",
                "train_split": "train",
                "validation_split": "val",
                "train_batch_size": 32,
                "val_batch_size": 32,
                # shape-generic image masks (the reference's MNIST mixture
                # hardcodes 28x28 pattern/rectangle geometry)
                "mask_generator": "RectangleMaskGenerator",
            },
            # Replace with your own run dir from train_vqvae.py.
            "vqvae_dir": "runs/vqvae-digits16",
            "pixel_cnn": {
                "image_shape": (4, 4),
                "num_resnet": 6,
                "num_hierarchies": 1,
                "num_filters": 64,
                "dropout": 0.5,
            },
            "conditional_dim": 256,
            "compute_dtype": config_dict.placeholder(str),
            "steps": 8000,
            "validation_freq": 1000,
            "lr_schedule": {
                "init_value": 3e-4,
                "decay_rate": 0.999995,
                "transition_steps": 1,
            },
        }
    )
