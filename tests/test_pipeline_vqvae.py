"""Integration test: the two-stage VQ-VAE -> PM-VQVAE pipeline, end to end on
tiny shapes (warm start, freezing, on-device masks, imputation)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from posterior_matching_tpu import masking
from posterior_matching_tpu.data.datasets import ArrayDataset
from posterior_matching_tpu.models.pm_vqvae import PMVQVAE, pm_vqvae_impute
from posterior_matching_tpu.models.vqvae import VQVAE
from posterior_matching_tpu.train import Trainer

VQ_CONFIG = {
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

PIXEL_CNN_CONFIG = {
    "image_shape": (4, 4),
    "num_resnet": 1,
    "num_hierarchies": 1,
    "num_filters": 8,
    "dropout": 0.0,
    "num_indices": 16,
}


@pytest.fixture(scope="module")
def image_data():
    rng = np.random.RandomState(0)
    return (rng.rand(32, 16, 16, 1) > 0.5).astype(np.float32)


def _train_vqvae(image_data):
    model = VQVAE(**VQ_CONFIG)
    ds = ArrayDataset({"image": image_data}, batch_size=8)

    def loss_fn(params, state, key, step, batch, is_training):
        out, new_state = model.apply(
            {"params": params, **state}, batch["image"],
            is_training=is_training, mutable=["vq_ema"],
        )
        if not is_training:
            new_state = state
        return out["loss"], {}, new_state

    def init_fn(key, batch):
        variables = model.init(key, batch["image"], is_training=True)
        params = variables.pop("params")
        return params, dict(variables)

    trainer = Trainer(loss_fn, init_fn, optax.adam(1e-3), seed=0)
    return trainer.fit(ds, steps=5, validation_freq=100)


def test_two_stage_pipeline(image_data):
    vq_state = _train_vqvae(image_data)

    model = PMVQVAE.from_config(16, VQ_CONFIG, PIXEL_CNN_CONFIG)
    mask_fn = masking.get_mask_generator("MNISTMaskGenerator", dim=16)

    def prologue(batch, key):
        return masking.add_mask(batch, key, mask_fn)

    def loss_fn(params, state, key, step, batch, is_training):
        ll, _ = model.apply(
            {"params": params, **state},
            batch["image"], batch["mask"], training=is_training,
            rngs={"dropout": key}, mutable=["vq_ema"],
        )
        return -jnp.mean(ll), {}, state

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

    ds = ArrayDataset({"image": image_data}, batch_size=8)
    trainer = Trainer(
        loss_fn, init_fn, optax.adam(1e-3),
        trainable_predicate=trainable_predicate,
        prologue_fn=prologue, seed=1,
    )

    vq_params_host = jax.device_get(vq_state.params)
    ts = trainer.fit(
        ds, steps=3, validation_freq=100,
        initial_params={"vqvae": vq_params_host},
        initial_state={
            "vq_ema": {"vqvae": jax.device_get(vq_state.state)["vq_ema"]}
        },
    )

    # 1) vqvae subtree must be EXACTLY the warm-start params (frozen)
    final_vq = jax.device_get(ts.params)["vqvae"]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        final_vq, vq_params_host,
    )
    # 2) pixel_cnn subtree must have moved
    # (compare vs fresh init with same seed)
    ts0 = trainer.init(
        trainer._shard(next(iter(ds))),
        initial_params={"vqvae": vq_params_host},
    )
    moved = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            jax.device_get(ts.params)["pixel_cnn"],
            jax.device_get(ts0.params)["pixel_cnn"],
        )
    )
    assert max(moved) > 0

    # 3) imputation: correct shapes, clipped range, observed passthrough
    x = jnp.asarray(image_data[:4])
    b = mask_fn(jax.random.PRNGKey(0), x.shape).reshape(4, 16, 16, 1)
    variables = {"params": ts.params, **jax.device_get(ts.state)}
    imp = pm_vqvae_impute(
        model, variables, x, b, jax.random.PRNGKey(1), num_samples=2
    )
    assert imp.shape == (4, 2, 16, 16, 1)
    imp = np.asarray(imp)
    assert imp.min() >= 0.0 and imp.max() <= 1.0
    bm = np.asarray(b)
    for s in range(2):
        np.testing.assert_allclose(
            imp[:, s][bm == 1], np.asarray(x)[bm == 1]
        )


def test_bf16_compute_dtype(image_data):
    """compute_dtype='bfloat16' keeps params float32, emits float32 heads,
    and the objective stays close to the f32 path."""
    x = jnp.asarray(image_data[:8])
    b = jnp.asarray(
        (np.random.RandomState(1).rand(8, 16, 16, 1) > 0.3).astype(np.float32)
    )

    def build(dtype):
        model = PMVQVAE.from_config(
            16, VQ_CONFIG, PIXEL_CNN_CONFIG, compute_dtype=dtype
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, b, training=False,
        )
        ll = model.apply(variables, x, b, training=False)
        return model, variables, ll

    _, vars32, ll32 = build(None)
    _, vars16, ll16 = build("bfloat16")

    # identical init (params are created in f32 in both cases)
    chex = jax.tree_util.tree_all(
        jax.tree.map(
            lambda a, b_: a.dtype == b_.dtype == jnp.float32
            if jnp.issubdtype(a.dtype, jnp.floating) else True,
            vars32["params"], vars16["params"],
        )
    )
    assert chex
    assert ll16.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(ll16)))
    # bf16 conv stacks perturb but do not change the objective's scale
    np.testing.assert_allclose(
        np.asarray(ll16), np.asarray(ll32), rtol=0.1, atol=2.0
    )


def test_naive_sampler_fallback_warns(image_data):
    """Topologies outside the cached sampler's coverage (hierarchies > 1 or
    non-(3,3) receptive fields) must fall back LOUDLY: the naive raster
    sampler is ~77x slower on TPU (BASELINE.md)."""
    import warnings

    def init_all(model, x, b):
        # the loss path alone does not create the VQ-VAE decoder params
        # that imputation decodes through — trace both
        return model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, b,
            method=lambda m, x, b: (
                m(x, b, training=False),
                m.decode_code_samples(
                    jnp.zeros((1, x.shape[0], 4, 4), jnp.int32)
                ),
            ),
        )

    pc_cfg = dict(PIXEL_CNN_CONFIG, receptive_field_dims=(5, 5))
    model = PMVQVAE.from_config(16, VQ_CONFIG, pc_cfg)
    x = jnp.asarray(image_data[:2])
    b = jnp.ones_like(x)
    variables = init_all(model, x, b)
    with pytest.warns(UserWarning, match="naive full-forward raster"):
        imp = pm_vqvae_impute(
            model, variables, x, b, jax.random.PRNGKey(1), num_samples=1
        )
    assert imp.shape == (2, 1, 16, 16, 1)

    # the covered topology must NOT warn
    model2 = PMVQVAE.from_config(16, VQ_CONFIG, PIXEL_CNN_CONFIG)
    variables2 = init_all(model2, x, b)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        pm_vqvae_impute(
            model2, variables2, x, b, jax.random.PRNGKey(1), num_samples=1
        )
