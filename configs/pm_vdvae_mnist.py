"""PM-VDVAE on MNIST (reference configs/pm_vdvae_mnist.py).

Note: ``train_batch_size`` is the per-device batch size; the reference's
paper models trained on 8 TPUv3 cores (global batch 128) — our trainer scales
the global batch by the mesh size the same way.
"""
from ml_collections import config_dict

from configs._base import config_from


def get_config():
    return config_from(
        {
            "data": {
                "dataset": "mnist",
                "train_split": "train",
                "validation_split": "test",
                "train_batch_size": 16,
                "val_batch_size": 16,
                "mask_generator": "MNISTMaskGenerator",
            },
            "model": {
                "image_shape": (28, 28, 1),
                "encoder_blocks": "28x6,28d2,14x4,14d2,7x2,7d2,3x2,3d2,1x2",
                "decoder_blocks": "1x2,3m1,3x2,7m3,7x2,14m7,14x4,28m14,28x6",
                "latent_dim": 16,
                "width": 192,
                "bottleneck_multiple": 0.25,
                "no_bias_above": 64,
                "num_mixtures": 10,
                "custom_width_string": None,
                # set to "bfloat16" for MXU-rate bottleneck convs (params
                # and all distribution parameters stay float32)
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
            "lr": 0.00015,
            "steps": 500000,
            "validation_freq": 5000,
        }
    )
