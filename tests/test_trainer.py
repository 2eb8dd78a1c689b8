"""Trainer tests: sharded training, freezing, EMA, non-finite skipping,
determinism, warm starts."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from posterior_matching_tpu.data.datasets import ArrayDataset
from posterior_matching_tpu.train import Trainer


class TinyModel(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Dense(8, name="enc")(x)
        h = jax.nn.relu(h)
        return nn.Dense(x.shape[-1], name="dec")(h)


def _make_problem(n=256, d=4, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    ds = ArrayDataset({"features": x}, batch_size=32, shuffle=True, seed=0)
    model = TinyModel()

    def loss_fn(params, state, key, step, batch, is_training):
        pred = model.apply({"params": params}, batch["features"])
        loss = jnp.mean((pred - batch["features"]) ** 2)
        return loss, {"mse": loss}, state

    def init_fn(key, batch):
        variables = model.init(key, batch["features"])
        return variables["params"], {}

    return ds, loss_fn, init_fn


def test_loss_decreases():
    ds, loss_fn, init_fn = _make_problem()
    trainer = Trainer(loss_fn, init_fn, optax.adam(1e-2), seed=0)
    logs = []
    ts = trainer.fit(
        ds, steps=100, validation_freq=50, log_fn=lambda m: logs.append(m)
    )
    assert int(ts.step) == 100


def test_multi_device_matches_single_device():
    """Same seed, same data: 8-device data-parallel result must match the
    single-device result (global batch identical)."""
    assert jax.device_count() == 8
    ds, loss_fn, init_fn = _make_problem()
    t1 = Trainer(loss_fn, init_fn, optax.adam(1e-2), num_devices=1, seed=0)
    ts1 = t1.fit(ds, steps=20, validation_freq=100)
    ds2, _, _ = _make_problem()
    t8 = Trainer(loss_fn, init_fn, optax.adam(1e-2), num_devices=8, seed=0)
    ts8 = t8.fit(ds2, steps=20, validation_freq=100)
    p1 = jax.device_get(ts1.params)
    p8 = jax.device_get(ts8.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        p1,
        p8,
    )


def test_determinism():
    results = []
    for _ in range(2):
        ds, loss_fn, init_fn = _make_problem()
        t = Trainer(loss_fn, init_fn, optax.adam(1e-2), seed=42)
        ts = t.fit(ds, steps=10, validation_freq=100)
        results.append(jax.device_get(ts.params))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), *results
    )


def test_trainable_predicate_freezes_params():
    ds, loss_fn, init_fn = _make_problem()

    def predicate(module_name, name, value):
        return "enc" in module_name

    t = Trainer(
        loss_fn,
        init_fn,
        optax.adam(1e-2),
        trainable_predicate=predicate,
        seed=0,
    )
    first = next(iter(ds))
    ts0 = t.init(first)
    init_dec = jax.device_get(ts0.params["dec"])
    init_enc = jax.device_get(ts0.params["enc"])
    # fit re-inits with the same seed, so compare against these
    ts = t.fit(ds, steps=30, validation_freq=100)
    final = jax.device_get(ts.params)
    np.testing.assert_array_equal(final["dec"]["kernel"], init_dec["kernel"])
    assert np.abs(final["enc"]["kernel"] - init_enc["kernel"]).max() > 1e-4


def test_skip_nonfinite_updates():
    n, d = 64, 4
    x = np.random.RandomState(0).randn(n, d).astype(np.float32)
    ds = ArrayDataset({"features": x}, batch_size=16)
    model = TinyModel()
    counter = {"calls": 0}

    def loss_fn(params, state, key, step, batch, is_training):
        pred = model.apply({"params": params}, batch["features"])
        loss = jnp.mean((pred - batch["features"]) ** 2)
        # inject a NaN loss on odd steps
        loss = jnp.where(step % 2 == 1, jnp.nan, loss)
        return loss, {}, state

    def init_fn(key, batch):
        return model.init(key, batch["features"])["params"], {}

    t = Trainer(
        loss_fn,
        init_fn,
        optax.sgd(1e-2),
        skip_nonfinite_updates=True,
        seed=0,
    )
    ts = t.fit(ds, steps=10, validation_freq=100)
    # params must remain finite despite NaN losses on half the steps
    assert all(
        np.isfinite(leaf).all() for leaf in jax.tree.leaves(
            jax.device_get(ts.params)
        )
    )


def test_ema_params_track():
    ds, loss_fn, init_fn = _make_problem()
    t = Trainer(
        loss_fn, init_fn, optax.adam(1e-2), ema_rate=0.5, seed=0
    )
    ts = t.fit(ds, steps=50, validation_freq=100)
    ema = jax.device_get(ts.ema_params)
    params = jax.device_get(ts.params)
    # EMA close to but not equal to current params
    diff = np.abs(ema["enc"]["kernel"] - params["enc"]["kernel"]).max()
    assert 0 < diff < 1.0


def test_warm_start_merge():
    ds, loss_fn, init_fn = _make_problem()
    t = Trainer(loss_fn, init_fn, optax.adam(1e-2), seed=0)
    first = next(iter(ds))
    ts = t.init(first)
    canned = jax.tree.map(lambda x: np.full_like(x, 0.123), ts.params["enc"])
    t2 = Trainer(loss_fn, init_fn, optax.adam(1e-2), seed=0)
    ts2 = t2.init(first, initial_params={"enc": canned})
    got = jax.device_get(ts2.params["enc"]["kernel"])
    np.testing.assert_allclose(got, 0.123)
    # dec stays freshly initialized
    assert np.abs(jax.device_get(ts2.params["dec"]["kernel"])).max() > 0


def test_prologue_runs_on_device():
    """Mask prologue is traced into the step (fused on-device masking)."""
    from posterior_matching_tpu import masking

    gen = masking.get_mask_generator("BernoulliMaskGenerator")

    def prologue(batch, key):
        return masking.add_mask(batch, key, gen)

    n, d = 64, 4
    x = np.random.RandomState(0).randn(n, d).astype(np.float32)
    ds = ArrayDataset({"features": x}, batch_size=16)
    model = TinyModel()
    seen = {}

    def loss_fn(params, state, key, step, batch, is_training):
        assert "mask" in batch
        seen["mask"] = True
        pred = model.apply({"params": params}, batch["features"] * batch["mask"])
        loss = jnp.mean((pred - batch["features"]) ** 2)
        return loss, {}, state

    def init_fn(key, batch):
        return model.init(key, batch["features"])["params"], {}

    t = Trainer(loss_fn, init_fn, optax.adam(1e-2), prologue_fn=prologue, seed=0)
    t.fit(ds, steps=5, validation_freq=100)
    assert seen.get("mask")


def test_steps_per_call_matches_per_step():
    """A scan-fused run (steps_per_call=5) must produce EXACTLY the params of
    the per-step run: same batches, same fold_in(base_key, step) RNG."""
    ds, loss_fn, init_fn = _make_problem()
    t1 = Trainer(loss_fn, init_fn, optax.adam(1e-2), seed=0)
    ts1 = t1.fit(ds, steps=20, validation_freq=20)
    ds2, _, _ = _make_problem()
    t5 = Trainer(loss_fn, init_fn, optax.adam(1e-2), seed=0, steps_per_call=5)
    ts5 = t5.fit(ds2, steps=20, validation_freq=20)
    assert int(ts5.step) == 20
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        jax.device_get(ts1.params),
        jax.device_get(ts5.params),
    )


def test_steps_per_call_tail_chunk():
    """steps not divisible by steps_per_call: the tail runs as a smaller
    scan and the step counter still lands exactly on `steps`."""
    ds, loss_fn, init_fn = _make_problem()
    t = Trainer(loss_fn, init_fn, optax.adam(1e-2), seed=0, steps_per_call=8)
    ts = t.fit(ds, steps=19, validation_freq=64)
    assert int(ts.step) == 19


def test_steps_per_call_validation_freq_check():
    ds, loss_fn, init_fn = _make_problem()
    t = Trainer(loss_fn, init_fn, optax.adam(1e-2), seed=0, steps_per_call=7)
    with pytest.raises(ValueError):
        t.fit(ds, steps=20, validation_freq=10)


def test_device_resident_dataset_trains():
    """DeviceDataset + steps_per_call: zero host batches per chunk; loss
    decreases; batch stays sharded over the 8-device mesh."""
    from posterior_matching_tpu.data.datasets import DeviceDataset

    rng = np.random.RandomState(0)
    x = rng.randn(256, 4).astype(np.float32)
    _, loss_fn, init_fn = _make_problem()
    dds = DeviceDataset({"features": x}, batch_size=32)
    logs = []
    t = Trainer(
        loss_fn, init_fn, optax.adam(1e-2), num_devices=8, seed=0,
        steps_per_call=10,
    )
    ts = t.fit(dds, steps=100, validation_freq=50,
               log_fn=lambda m: logs.append(m))
    assert int(ts.step) == 100
    first = float(logs[0].split("loss=")[1].split()[0])
    last = float(logs[-1].split("loss=")[1].split()[0])
    assert last < first


def test_device_resident_transform_applied():
    """The on-device transform (e.g. uint8 -> f32 rescale) runs inside the
    jitted chunk."""
    from posterior_matching_tpu.data.datasets import DeviceDataset

    rng = np.random.RandomState(0)
    x_u8 = rng.randint(0, 256, (64, 4)).astype(np.uint8)

    def transform(batch):
        return {"features": batch["features"].astype(jnp.float32) / 255.0}

    _, loss_fn, init_fn = _make_problem()
    dds = DeviceDataset({"features": x_u8}, batch_size=16,
                        transform=transform)
    eb = dds.example_batch()
    assert eb["features"].dtype == np.float32
    assert eb["features"].max() <= 1.0
    t = Trainer(loss_fn, init_fn, optax.adam(1e-2), seed=0, steps_per_call=4)
    ts = t.fit(dds, steps=8, validation_freq=8)
    assert int(ts.step) == 8


def test_to_device_resident_materializes_transform():
    """ArrayDataset.to_device_resident applies the host transform once and
    preserves every example in order."""
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (50, 3)).astype(np.uint8)

    def transform(batch):
        return {"features": batch["features"].astype(np.float32) / 255.0}

    ds = ArrayDataset({"features": x}, batch_size=16, transform=transform)
    dds = ds.to_device_resident()
    assert dds.num_examples == 50  # remainder batch kept
    np.testing.assert_allclose(
        dds.data["features"], x.astype(np.float32) / 255.0
    )
    spec = dds.element_spec
    assert spec["features"] == ((16, 3), np.dtype(np.float32))


def test_to_device_resident_keeps_uint8_for_pure_rescale():
    """A pure u8->f32 rescale transform is moved on-device: HBM holds uint8,
    the device transform produces the same batches."""
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (20, 4, 4, 1)).astype(np.uint8)

    def transform(batch):
        out = dict(batch)
        out["image"] = out["image"].astype(np.float32) / 255.0
        return out

    transform.u8_scale_fields = {"image": 1.0 / 255.0}
    ds = ArrayDataset({"image": x}, batch_size=8, transform=transform)
    dds = ds.to_device_resident()
    assert dds.data["image"].dtype == np.uint8  # not materialized to f32
    eb = dds.example_batch()
    np.testing.assert_allclose(eb["image"], x[:8].astype(np.float32) / 255.0)
    # host iteration works (VaDE GMM phase contract)
    total = sum(len(b["image"]) for b in dds)
    assert total == 20


def test_rng_impl_rbg():
    """rng_impl="rbg" (the TPU default via "auto") must train correctly on
    any backend: the loss key handed to loss_fn is a valid typed rbg key and
    training still converges deterministically for a fixed seed."""
    seen_impls = []

    class DropModel(nn.Module):
        @nn.compact
        def __call__(self, x, training=False):
            h = nn.Dense(8, name="enc")(x)
            h = nn.Dropout(0.5, deterministic=not training)(h)
            return nn.Dense(x.shape[-1], name="dec")(h)

    rng = np.random.RandomState(0)
    x = rng.randn(64, 4).astype(np.float32)
    model = DropModel()

    def loss_fn(params, state, key, step, batch, is_training):
        seen_impls.append(getattr(key.dtype, "name", str(key.dtype)))
        pred = model.apply(
            {"params": params}, batch["features"], training=is_training,
            rngs={"dropout": key},
        )
        loss = jnp.mean((pred - batch["features"]) ** 2)
        return loss, {}, state

    def init_fn(key, batch):
        variables = model.init(key, batch["features"])
        return variables["params"], {}

    def run():
        ds = ArrayDataset({"features": x}, batch_size=32, shuffle=True, seed=0)
        t = Trainer(loss_fn, init_fn, optax.adam(1e-2), seed=0, rng_impl="rbg")
        return t.fit(ds, steps=10, validation_freq=100)

    ts1, ts2 = run(), run()
    assert any("rbg" in s for s in seen_impls)
    for a, b in zip(jax.tree.leaves(ts1.params), jax.tree.leaves(ts2.params)):
        np.testing.assert_array_equal(jax.device_get(a), jax.device_get(b))


def test_rng_impl_validation():
    ds, loss_fn, init_fn = _make_problem()
    with pytest.raises(ValueError):
        Trainer(loss_fn, init_fn, optax.adam(1e-2), rng_impl="bogus")


def test_multi_device_step_contains_gradient_allreduce():
    """The 8-device sharded train step must lower to an HLO containing a
    cross-replica all-reduce for the gradients (XLA inserts it from the
    NamedSharding — this pins the data-parallel semantics at the compiler
    level, not just numerically)."""
    ds, loss_fn, init_fn = _make_problem()
    t8 = Trainer(loss_fn, init_fn, optax.adam(1e-2), num_devices=8, seed=0)
    first = next(iter(ds))
    ts = t8.init(t8._shard(first))
    t8._train_step = t8._make_train_step()
    lowered = t8._train_step.lower(
        ts, t8._shard(first), jax.random.PRNGKey(0)
    )
    hlo = lowered.compile().as_text()
    assert "all-reduce" in hlo, "no gradient all-reduce in the 8-device step"


def test_group_optimizer_matches_tree_through_trainer():
    """group_by_shape-wrapped optimizer through the Trainer (with and
    without a trainable_predicate / multi_transform freeze) must equal the
    per-leaf path exactly — the TPU update-consolidation used by the
    flagship bench and the VDVAE flat_optimizer config."""
    from posterior_matching_tpu.train import group_by_shape

    for predicate in (None, lambda mod, name, val: "enc" in mod):
        ds, loss_fn, init_fn = _make_problem()
        t_tree = Trainer(
            loss_fn, init_fn, optax.adam(1e-2),
            trainable_predicate=predicate, seed=0,
        )
        ts_tree = t_tree.fit(ds, steps=20, validation_freq=100)
        ds2, _, _ = _make_problem()
        t_grp = Trainer(
            loss_fn, init_fn, group_by_shape(optax.adam(1e-2)),
            trainable_predicate=predicate, seed=0,
        )
        ts_grp = t_grp.fit(ds2, steps=20, validation_freq=100)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                jax.device_get(a), jax.device_get(b), rtol=1e-6, atol=1e-7
            ),
            ts_tree.params,
            ts_grp.params,
        )


def test_stacked_shape_mask_decay_matches_reference_chain():
    """The grouped VDVAE chain — group_by_shape(clip -> adam ->
    add_decayed_weights(wd, stacked_shape_mask) -> schedule -> scale) —
    must be bit-identical to the reference-style per-leaf chain with the
    ndim != 1 decay mask (reference train_pm_vdvae.py optax chain)."""
    from posterior_matching_tpu.train import group_by_shape, stacked_shape_mask

    params = {
        "w": jnp.asarray(np.random.RandomState(0).randn(4, 3), jnp.float32),
        "w2": jnp.asarray(np.random.RandomState(2).randn(4, 3), jnp.float32),
        "b": jnp.asarray(np.random.RandomState(1).randn(3), jnp.float32),
    }
    sched = optax.linear_schedule(0.0, 1e-3, 3)

    def chain(mask):
        return optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.scale_by_adam(),
            optax.add_decayed_weights(0.01, mask=mask),
            optax.scale_by_schedule(sched),
            optax.scale(-1.0),
        )

    ref = chain(lambda p: jax.tree.map(lambda x: x.ndim != 1, p))
    grp = group_by_shape(chain(stacked_shape_mask()))
    s1, s2 = ref.init(params), grp.init(params)
    p1 = p2 = params
    for _ in range(5):
        g1 = jax.tree.map(lambda p: p * 0.3 + 0.01, p1)
        u1, s1 = ref.update(g1, s1, p1)
        p1 = optax.apply_updates(p1, u1)
        g2 = jax.tree.map(lambda p: p * 0.3 + 0.01, p2)
        u2, s2 = grp.update(g2, s2, p2)
        p2 = optax.apply_updates(p2, u2)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            jax.device_get(a), jax.device_get(b)
        ),
        p1,
        p2,
    )


def test_group_by_shape_matches_tree_optimizer():
    """group_by_shape (train/optim.py — the TPU-native per-shape-group
    update consolidation; optax.flatten's ravel forces re-tiling relayouts
    on TPU and measured slower) must be bit-identical to the per-leaf
    optimizer, standalone and inside a clip chain, including scalar and
    duplicate-shaped leaves."""
    from posterior_matching_tpu.train.optim import group_by_shape

    rng = np.random.RandomState(0)
    params = {
        "a": jnp.asarray(rng.randn(4, 3), jnp.float32),
        "b": jnp.asarray(rng.randn(4, 3), jnp.float32),
        "c": jnp.asarray(rng.randn(5), jnp.float32),
        "s": jnp.asarray(rng.randn(), jnp.float32),
        "d": {"e": jnp.asarray(rng.randn(4, 3), jnp.float32)},
    }
    for make in (
        lambda: optax.adam(1e-2),
        lambda: optax.chain(optax.clip_by_global_norm(0.5), optax.adam(1e-2)),
    ):
        t_tree, t_grp = make(), group_by_shape(make())
        s1, s2 = t_tree.init(params), t_grp.init(params)
        p1 = p2 = params
        for _ in range(4):
            g1 = jax.tree.map(lambda p: p * 0.2 + 0.03, p1)
            u1, s1 = t_tree.update(g1, s1, p1)
            p1 = optax.apply_updates(p1, u1)
            g2 = jax.tree.map(lambda p: p * 0.2 + 0.03, p2)
            u2, s2 = t_grp.update(g2, s2, p2)
            p2 = optax.apply_updates(p2, u2)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                jax.device_get(a), jax.device_get(b)
            ),
            p1,
            p2,
        )
