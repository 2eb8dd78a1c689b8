"""Conv VaDE on the real 16x16 digits images.

The reference's VaDE architecture family — conv encoder/decoder + Bernoulli
likelihood (reference configs/vade_mnist.py) — scaled from 28x28 MNIST to
the real 16x16 sklearn digits (datasets/prepare_local.py): two stride-2
stages end at 4x4, so the final VALID layer uses a 4x4 kernel (the reference
uses 7x7 at its 7x7 resolution).
"""
from configs._base import config_from


def get_config():
    batch = 128
    return config_from(
        {
            "data": {
                "dataset": "digits16",
                "train_split": "train",
                "validation_split": "val",
                "train_batch_size": batch,
                "val_batch_size": batch,
            },
            "model": {
                "encoder_net": "ConvEncoder",
                "decoder_net": "ConvDecoder",
                "decoder_dist": "Bernoulli",
                "latent_dim": 10,
                "num_components": 10,
                "encoder_net_config": {
                    "conv_layers": [
                        (32, 5, 1),
                        (32, 5, 2),
                        (64, 5, 1),
                        (64, 5, 2),
                        (128, 4, 1),
                    ]
                },
                "decoder_net_config": {
                    "conv_layers": [
                        (64, 4, 1),
                        (64, 5, 2),
                        (32, 5, 1),
                        (32, 5, 2),
                        (32, 5, 1),
                        (1, 5, 1),
                    ]
                },
            },
            # ~150 epochs pretrain / ~300 epochs ELBO at 1,437 train rows,
            # the reference's epoch budget (reference configs/vade_mnist.py).
            "pretrain_steps": 1700,
            "steps": 3400,
            "validation_freq": 200,
            "cluster_pred_num_samples": 50,
            "pretrain_lr": 0.002,
            "lr_schedule": {
                "init_value": 0.002,
                "decay_rate": 0.9,
                "staircase": False,
                "transition_steps": 110,
            },
            "adam": {"eps": 1e-4},
        }
    )
