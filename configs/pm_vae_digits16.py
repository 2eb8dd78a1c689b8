"""Conv PM-VAE on the real 16x16 digits images.

The reference's conv PM-VAE family (reference configs/pm_vae_mnist16.py:
conv encoder/decoder, TriL posterior, Bernoulli likelihood, uniform masks
observing 0-20% of pixels) on the REAL sklearn digits images
(datasets/prepare_local.py); steps scaled to the 1,437-row train split.
"""
from configs._base import config_from


def get_config():
    return config_from(
        {
            "data": {
                "dataset": "digits16",
                "train_split": "train",
                "validation_split": "val",
                "train_batch_size": 128,
                "val_batch_size": 128,
                "mask_generator": "UniformMaskGenerator",
                "mask_generator_kwargs": {"bounds": (0.0, 0.2)},
            },
            "model": {
                "latent_dim": 10,
                "encoder_net": "ConvEncoder",
                "decoder_net": "ConvDecoder",
                "posterior_dist": "TriLGaussian",
                "decoder_dist": "Bernoulli",
                "encoder_net_config": {
                    "conv_layers": [
                        (32, 3, 1),
                        (32, 3, 2),
                        (64, 3, 2),
                        (64, 1, 1),
                    ]
                },
                "decoder_net_config": {
                    "conv_layers": [
                        (64, 8, 1),
                        (64, 5, 2),
                        (32, 5, 1),
                        (32, 5, 1),
                        (1, 3, 1),
                    ]
                },
            },
            "steps": 8000,
            "validation_freq": 1000,
            "lr_schedule": {
                "init_value": 0.001,
                "decay_rate": 0.9,
                "transition_steps": 1000,
            },
        }
    )
