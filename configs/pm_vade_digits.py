"""PM-VaDE partial encoder on a frozen real-digits VaDE.

The reference's partially observed clustering stage (reference
configs/pm_vade_mnist.py, train_pm_vade.py) on the REAL sklearn digits
(datasets/prepare_local.py): train only the partial encoder against the
frozen VaDE from configs/vade_digits.py and measure clustering accuracy
from masked inputs against the real 10-class labels.
"""
from configs._base import config_from


def get_config():
    batch = 128
    return config_from(
        {
            "data": {
                "dataset": "digits_flat",
                "train_split": "train",
                "validation_split": "val",
                "train_batch_size": batch,
                "val_batch_size": batch,
            },
            # Replace with your own run dir from train_vade.py.
            "vade_dir": "runs/vade-digits_flat",
            "model": {
                "encoder_net": "ResidualMLP",
                "decoder_net": "ResidualMLP",
                "decoder_dist": "IdentityGaussian",
                "latent_dim": 10,
                "num_components": 10,
                "partial_posterior_dist": "AutoregressiveGMM",
                "partial_posterior_dist_config": {
                    "num_components": 10,
                    "residual_blocks": 2,
                    "hidden_units": 256,
                },
                "encoder_net_config": {
                    "residual_blocks": 2,
                    "hidden_units": 256,
                },
                "decoder_net_config": {
                    "residual_blocks": 2,
                    "hidden_units": 256,
                },
                "decoder_dist_config": {"event_size": 64},
            },
            "steps": 8000,
            "validation_freq": 1000,
            "cluster_pred_num_samples": 50,
            "lr_schedule": {
                "init_value": 0.001,
                "decay_rate": 0.9,
                "staircase": False,
                "transition_steps": 1000,
            },
        }
    )
