"""VaDE on MNIST (reference configs/vade_mnist.py)."""
from configs._base import config_from


def get_config():
    batch = 128
    return config_from(
        {
            "data": {
                "dataset": "mnist",
                "train_split": "train",
                "validation_split": "test",
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
                        (128, 7, 1),
                    ]
                },
                "decoder_net_config": {
                    "conv_layers": [
                        (64, 7, 1),
                        (64, 5, 2),
                        (32, 5, 1),
                        (32, 5, 2),
                        (32, 5, 1),
                        (1, 5, 1),
                    ]
                },
            },
            "pretrain_steps": int(60000 / batch * 150),
            "steps": int(60000 / batch * 300),
            "validation_freq": 1000,
            "cluster_pred_num_samples": 50,
            "pretrain_lr": 0.002,
            "lr_schedule": {
                "init_value": 0.002,
                "decay_rate": 0.9,
                "staircase": False,
                "transition_steps": int(60000 / batch * 10),
            },
            "adam": {"eps": 1e-4},
        }
    )
