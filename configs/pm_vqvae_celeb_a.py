"""Stage-2 PM-VQVAE on CelebA (reference configs/pm_vqvae_celeb_a.py).

The north-star benchmark workload (BASELINE.md)."""
from ml_collections import config_dict

from configs._base import config_from


def get_config():
    return config_from(
        {
            "data": {
                "dataset": "celeb_a",
                "train_split": "train",
                "validation_split": "validation",
                "train_batch_size": 32,
                "val_batch_size": 32,
                "mask_generator": "CelebAMaskGenerator",
            },
            # Replace with your own run dir from train_vqvae.py.
            "vqvae_dir": "runs/vqvae-celeb_a",
            "pixel_cnn": {
                "image_shape": (16, 16),
                "num_resnet": 12,
                "num_hierarchies": 1,
                "num_filters": 128,
                "dropout": 0.5,
            },
            "conditional_dim": 512,
            # "bfloat16" runs all three submodules' conv stacks at
            # MXU bf16 rate (params/heads stay f32)
            "compute_dtype": config_dict.placeholder(str),
            # packed_chain: hold the PixelCNN gated-chain weights in
            # kernel-native stacked form during training (optimizer over
            # ~26 stacked tensors instead of ~100 leaves; checkpoints stay
            # canonical). None = auto: on when the TPU fused-chain kernels
            # are active. Elementwise-optimizer-exact
            # (tests/test_packed_chain.py).
            "packed_chain": config_dict.placeholder(bool),
            "steps": 150000,
            "validation_freq": 2000,
            "lr_schedule": {
                "init_value": 3e-4,
                "decay_rate": 0.999995,
                "transition_steps": 1,
            },
        }
    )
