"""VaDE on real sklearn digits (64-d features, 10 real classes).

The 3-phase VaDE pipeline (reference train_vade.py: autoencoder pretrain ->
sklearn GMM graft -> ELBO training) with MLP networks on the flattened real
digits from datasets/prepare_local.py — real clustering accuracy against the
real labels, vs the synthetic stand-in every other image config falls back to
without egress.
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
            "model": {
                "encoder_net": "ResidualMLP",
                "decoder_net": "ResidualMLP",
                # IdentityGaussian projects the MLP trunk to the event size;
                # the Bernoulli head (reference distributions.py:20-25)
                # interprets the net output directly as logits and therefore
                # only fits conv decoders that emit the image shape.
                "decoder_dist": "IdentityGaussian",
                "latent_dim": 10,
                "num_components": 10,
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
            "pretrain_steps": 3000,
            "steps": 6000,
            "validation_freq": 1000,
            "cluster_pred_num_samples": 50,
            "pretrain_lr": 0.002,
            "lr_schedule": {
                "init_value": 0.002,
                "decay_rate": 0.9,
                "staircase": False,
                "transition_steps": 200,
            },
            "adam": {"eps": 1e-4},
        }
    )
