"""PM-VDVAE on the real 16x16 digits images.

The reference's flagship hierarchical model (reference
configs/pm_vdvae_mnist.py) scaled from 28x28 MNIST to the real 16x16
sklearn digits (datasets/prepare_local.py): the 28/14/7/3/1 resolution
ladder becomes 16/8/4/1, block counts and width shrunk to the dataset size
(1,437 train images vs 60,000).
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
                "train_batch_size": 16,
                "val_batch_size": 16,
                # shape-generic image masks (MNISTMaskGenerator hardcodes
                # 28x28 pattern geometry)
                "mask_generator": "RectangleMaskGenerator",
            },
            "model": {
                "image_shape": (16, 16, 1),
                "encoder_blocks": "16x3,16d2,8x3,8d2,4x2,4d4,1x2",
                "decoder_blocks": "1x2,4m1,4x2,8m4,8x3,16m8,16x3",
                "latent_dim": 8,
                "width": 64,
                "bottleneck_multiple": 0.25,
                "no_bias_above": 32,
                "num_mixtures": 5,
                "custom_width_string": None,
                "compute_dtype": config_dict.placeholder(str),
            },
            # flat_optimizer: consolidate clip+adam+wd over same-shape
            # leaf GROUPS stacked along a new leading axis (train/optim.py
            # group_by_shape — raveling to one vector is the TPU
            # anti-pattern this replaces) — same math, far fewer kernels;
            # changes the optimizer-state pickle ABI, so off by default.
            "flat_optimizer": False,
            "ema_rate": 0.999,
            "gradient_clip": 200.0,
            "lr": 0.0003,
            "steps": 6000,
            "validation_freq": 500,
        }
    )
