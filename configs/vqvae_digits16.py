"""Stage-1 VQ-VAE on real sklearn digits resized to 16x16.

Same architecture family as configs/vqvae_mnist.py (reference
configs/vqvae_mnist.py) on the real digits images from
datasets/prepare_local.py; the two stride-2 conv stages give a 4x4 code grid.
"""
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
            },
            "model": {
                "embedding_dim": 64,
                "num_embeddings": 128,
                "hidden_units": 32,
                "residual_hidden_units": 32,
                "residual_blocks": 2,
                "decay": 0.99,
                "use_ema": True,
                "commitment_cost": 0.25,
                "output_channels": 1,
            },
            "steps": 6000,
            "validation_freq": 1000,
            "learning_rate": 3e-4,
        }
    )
