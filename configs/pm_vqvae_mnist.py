"""Stage-2 PM-VQVAE on MNIST (reference configs/pm_vqvae_mnist.py)."""
from ml_collections import config_dict

from configs._base import config_from


def get_config():
    return config_from(
        {
            "data": {
                "dataset": "mnist",
                "train_split": "train",
                "validation_split": "test",
                "train_batch_size": 32,
                "val_batch_size": 32,
                "mask_generator": "MNISTMaskGenerator",
            },
            # Replace with your own run dir from train_vqvae.py.
            "vqvae_dir": "runs/vqvae-mnist",
            "pixel_cnn": {
                "image_shape": (7, 7),
                "num_resnet": 8,
                "num_hierarchies": 1,
                "num_filters": 128,
                "dropout": 0.5,
            },
            "conditional_dim": 512,
            # "bfloat16" runs all three submodules' conv stacks at
            # MXU bf16 rate (params/heads stay f32)
            "compute_dtype": config_dict.placeholder(str),
            "steps": 120000,
            "validation_freq": 1000,
            "lr_schedule": {
                "init_value": 3e-4,
                "decay_rate": 0.999995,
                "transition_steps": 1,
            },
        }
    )
