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
