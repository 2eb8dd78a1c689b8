"""Packed-chain training representation (models/pixelcnn.py
pack_chain_params / unpack_chain_params / packed_chain apply path).

Contract: training with the chain weights held in kernel-native stacked form
(Adam on stacked tensors, pack/unpack at dispatch boundaries) is numerically
IDENTICAL to canonical per-leaf training — pack/unpack are exact
rearrangements and elementwise optimizers commute with them (see the
packed-chain module comment in models/pixelcnn.py). These tests pin that
claim in interpret mode on CPU, including the dropout path (mask_mode=input
draws happen in the same order on both paths).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from posterior_matching_tpu.models.pixelcnn import (
    PackedChainCodec,
    PixelCNN,
    is_chain_param,
    pack_chain_params,
    unpack_chain_params,
)

KW = dict(
    num_indices=12,
    image_shape=(4, 4),
    num_resnet=2,
    num_hierarchies=1,
    num_filters=8,
    receptive_field_dims=(3, 3),
)
PACK_KW = dict(num_resnet=KW["num_resnet"], num_filters=KW["num_filters"])


def _data(b=2, cond_dim=16, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randint(0, KW["num_indices"], (b, 4, 4)), jnp.int32)
    cond = jnp.asarray(rng.randn(b, cond_dim), jnp.float32)
    return x, cond


def test_pack_unpack_roundtrip():
    x, cond = _data()
    model = PixelCNN(dropout=0.0, fused_chain="interpret", **KW)
    params = model.init(jax.random.PRNGKey(0), x, cond)["params"]
    packed = pack_chain_params(params, **PACK_KW)
    # the packed tree has one [L, rows, cols] stack per kernel weight name
    assert set(packed) == {"up", "dn"}
    assert packed["up"]["wav"].shape[0] == KW["num_resnet"]
    restored = unpack_chain_params(packed, params, **PACK_KW)
    assert jax.tree.structure(restored) == jax.tree.structure(params)
    for (pa, a), (_, b_) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(restored), key=str),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_), err_msg=str(pa))


def test_packed_forward_matches_canonical():
    x, cond = _data()
    model = PixelCNN(dropout=0.0, fused_chain="interpret", **KW)
    variables = model.init(jax.random.PRNGKey(0), x, cond)
    packed = pack_chain_params(variables["params"], **PACK_KW)
    lc = model.apply(variables, x, cond, training=False)
    lp = model.apply(variables, x, cond, training=False, packed_chain=packed)
    np.testing.assert_array_equal(np.asarray(lp), np.asarray(lc))


@pytest.mark.parametrize("dropout", [0.0, 0.5])
def test_packed_training_equivalence(dropout):
    """3 Adam steps, canonical per-leaf vs packed representation: identical
    final canonical params (the packed-path trainer contract)."""
    x, cond = _data(b=4)
    model = PixelCNN(dropout=dropout, fused_chain="interpret", **KW)
    params0 = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(9)},
        x, cond, training=True,
    )["params"]
    tx = optax.adam(1e-3)

    def loss_canonical(p, key):
        ll = model.apply(
            {"params": p}, x, cond, training=dropout > 0,
            rngs={"dropout": key},
        )
        return -jnp.mean(jnp.sum(ll, axis=(1, 2)))

    # --- canonical per-leaf training --------------------------------------
    p = params0
    opt = tx.init(p)
    for i in range(3):
        g = jax.grad(loss_canonical)(p, jax.random.PRNGKey(100 + i))
        up, opt = tx.update(g, opt)
        p = optax.apply_updates(p, up)
    final_canonical = p

    # --- packed training ----------------------------------------------------
    packed0 = pack_chain_params(params0, **PACK_KW)
    rest0 = {k: v for k, v in params0.items() if not is_chain_param(k)}

    def loss_packed(train, key):
        # canonical chain leaves stay in the tree (unused by the packed
        # apply path) exactly as the trainer would keep them
        merged = {**params0, **train["rest"]}
        ll = model.apply(
            {"params": merged}, x, cond, training=dropout > 0,
            rngs={"dropout": key}, packed_chain=train["packed"],
        )
        return -jnp.mean(jnp.sum(ll, axis=(1, 2)))

    train = {"packed": packed0, "rest": rest0}
    opt = tx.init(train)
    for i in range(3):
        g = jax.grad(loss_packed)(train, jax.random.PRNGKey(100 + i))
        up, opt = tx.update(g, opt)
        train = optax.apply_updates(train, up)
    final_packed = {**params0, **train["rest"]}
    final_packed = unpack_chain_params(
        train["packed"], final_packed, **PACK_KW
    )

    assert jax.tree.structure(final_packed) == jax.tree.structure(
        final_canonical
    )
    for (pa, a), (_, b_) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(final_canonical), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(final_packed), key=str),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-6, atol=1e-7,
            err_msg=str(pa),
        )


def test_trainer_codec_equivalence():
    """Trainer(param_codec=PackedChainCodec.factory(...)) — the real CLI
    path (train_pm_vqvae.py) — must produce the SAME canonical params as
    canonical per-leaf training: the codec en/decodes inside each dispatch,
    the optimizer (incl. the multi_transform freeze labels) runs over the
    encoded tree, and TrainState.params stays canonical between dispatches
    (checkpoint ABI unchanged)."""
    from posterior_matching_tpu import masking
    from posterior_matching_tpu.data.datasets import ArrayDataset
    from posterior_matching_tpu.models.pm_vqvae import PMVQVAE
    from posterior_matching_tpu.train import Trainer

    vq_config = {
        "output_channels": 1,
        "embedding_dim": 8,
        "num_embeddings": 16,
        "hidden_units": 8,
        "residual_blocks": 1,
        "residual_hidden_units": 8,
        "decay": 0.99,
        "use_ema": True,
        "commitment_cost": 0.25,
    }
    pc_config = {
        "image_shape": (4, 4),
        "num_resnet": 2,
        "num_hierarchies": 1,
        "num_filters": 8,
        "dropout": 0.5,
        "num_indices": 16,
        "fused_chain": "interpret",
    }
    model = PMVQVAE.from_config(16, vq_config, pc_config)
    rng = np.random.RandomState(0)
    images = (rng.rand(16, 16, 16, 1) > 0.5).astype(np.float32)
    mask_fn = masking.get_mask_generator("BernoulliMaskGenerator", p=0.5)

    def prologue(batch, key):
        return masking.add_mask(batch, key, mask_fn)

    def init_fn(key, batch):
        k1, k2 = jax.random.split(key)
        variables = model.init(
            {"params": k1, "dropout": k2}, batch["image"], batch["mask"],
            training=True,
        )
        params = variables.pop("params")
        return params, dict(variables)

    def trainable_predicate(module_name, name, value):
        return not module_name.startswith("vqvae")

    def fit(use_codec):
        codec_cell = []

        def codec_factory(init_params):
            codec = PackedChainCodec(
                init_params, num_resnet=2, num_filters=8
            )
            codec_cell.append(codec)
            return codec

        def loss_fn(params, state, key, step, batch, is_training):
            packed = None
            if codec_cell and codec_cell[0].is_encoded(params):
                params, packed = codec_cell[0].split_encoded(params)
            ll, _ = model.apply(
                {"params": params, **state},
                batch["image"], batch["mask"], training=is_training,
                rngs={"dropout": key}, mutable=["vq_ema"],
                packed_chain=packed,
            )
            return -jnp.mean(ll), {}, state

        ds = ArrayDataset({"image": images}, batch_size=8)
        trainer = Trainer(
            loss_fn, init_fn, optax.adam(1e-3),
            trainable_predicate=trainable_predicate,
            prologue_fn=prologue, seed=3, steps_per_call=2,
            rng_impl=None,
            param_codec=codec_factory if use_codec else None,
        )
        return trainer.fit(ds, steps=4, validation_freq=100)

    ts_canon = fit(False)
    ts_codec = fit(True)

    p_c = jax.device_get(ts_canon.params)
    p_k = jax.device_get(ts_codec.params)
    # TrainState.params is CANONICAL in both runs (same structure)...
    assert jax.tree.structure(p_c) == jax.tree.structure(p_k)
    # ...with the same values (elementwise adam commutes with packing)
    for (pa, a), (_, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(p_c), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(p_k), key=str),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=str(pa),
        )
