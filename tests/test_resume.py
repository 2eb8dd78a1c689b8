"""Mid-run checkpoint/resume test: 20 straight steps == 10 steps + resume."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from posterior_matching_tpu.data.datasets import ArrayDataset
from posterior_matching_tpu.train import (
    Trainer,
    load_train_state,
    save_train_state,
)


class Tiny(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(x.shape[-1])(jax.nn.relu(nn.Dense(8)(x)))


def _setup():
    x = np.random.RandomState(0).randn(64, 4).astype(np.float32)
    model = Tiny()

    def loss_fn(params, state, key, step, batch, is_training):
        pred = model.apply({"params": params}, batch["features"])
        loss = jnp.mean((pred - batch["features"]) ** 2)
        return loss, {}, state

    def init_fn(key, batch):
        return model.init(key, batch["features"])["params"], {}

    def make():
        # shuffle=False so data order is identical across trainers
        ds = ArrayDataset({"features": x}, batch_size=16, shuffle=False)
        return (
            ds,
            Trainer(loss_fn, init_fn, optax.adam(1e-2), seed=7),
        )

    return make


def test_skip_stream_matches_replay_and_is_gather_free():
    """Constant-time resume: skip_stream(n) must (a) reproduce exactly the
    stream a step-by-step replay would produce, across epoch boundaries and
    shuffled epochs, and (b) cost ZERO gathers for the skipped batches."""
    x = np.arange(56 * 3, dtype=np.float32).reshape(56, 3)

    def stream(ds, n):
        out = []
        while len(out) < n:
            for b in ds:
                out.append(b["features"])
                if len(out) == n:
                    break
        return out

    # cardinality = 7 batches/epoch; skip points cover in-epoch, epoch
    # boundary, and multi-epoch cases
    for skip in [0, 3, 7, 8, 20, 23]:
        ref = stream(ArrayDataset({"features": x}, 8, shuffle=True, seed=5), 26)
        ds = ArrayDataset({"features": x}, 8, shuffle=True, seed=5)
        ds.skip_stream(skip)
        got = stream(ds, 26 - skip)
        for i, g in enumerate(got):
            np.testing.assert_array_equal(g, ref[skip + i], err_msg=str(skip))

    # Gather count: skipping 100 epochs + 3 batches must gather nothing
    # until the next draw, which gathers exactly once.
    ds = ArrayDataset({"features": x}, 8, shuffle=True, seed=5)
    calls = []
    orig = ds._gather
    ds._gather = lambda sel: (calls.append(1), orig(sel))[1]
    ds.skip_stream(100 * 7 + 3)
    assert calls == []
    it = iter(ds)
    next(it)
    assert len(calls) == 1


def test_spec_batch_does_not_touch_shuffle_rng():
    x = np.random.RandomState(0).randn(32, 4).astype(np.float32)
    a = ArrayDataset({"features": x}, 8, shuffle=True, seed=11)
    b = ArrayDataset({"features": x}, 8, shuffle=True, seed=11)
    _ = a.spec_batch()
    np.testing.assert_array_equal(
        next(iter(a))["features"], next(iter(b))["features"]
    )


def test_resume_matches_straight_run_shuffled(tmp_path):
    """The trainer's constant-time fast-forward path (shuffle=True exercises
    the RNG-equivalence of skip_stream through Trainer.fit)."""
    x = np.random.RandomState(1).randn(64, 4).astype(np.float32)
    model = Tiny()

    def loss_fn(params, state, key, step, batch, is_training):
        pred = model.apply({"params": params}, batch["features"])
        loss = jnp.mean((pred - batch["features"]) ** 2)
        return loss, {}, state

    def init_fn(key, batch):
        return model.init(key, batch["features"])["params"], {}

    def make():
        ds = ArrayDataset({"features": x}, batch_size=16, shuffle=True, seed=3)
        return ds, Trainer(loss_fn, init_fn, optax.adam(1e-2), seed=7)

    ds, t_full = make()
    ts_full = t_full.fit(ds, steps=17, validation_freq=100)

    ds2, t_a = make()
    ts_a = t_a.fit(ds2, steps=9, validation_freq=100)
    path = str(tmp_path / "ckpt.pkl")
    save_train_state(path, ts_a)

    restored = load_train_state(path)
    ds3, t_b = make()
    ts_b = t_b.fit(ds3, steps=17, validation_freq=100, resume_from=restored)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        jax.device_get(ts_full.params),
        jax.device_get(ts_b.params),
    )


def test_resume_matches_straight_run(tmp_path):
    make = _setup()

    ds, t_full = make()
    ts_full = t_full.fit(ds, steps=20, validation_freq=100)

    ds2, t_a = make()
    ts_a = t_a.fit(ds2, steps=10, validation_freq=100)
    path = str(tmp_path / "ckpt.pkl")
    save_train_state(path, ts_a)

    restored = load_train_state(path)
    assert restored.step == 10
    ds3, t_b = make()
    ts_b = t_b.fit(ds3, steps=20, validation_freq=100, resume_from=restored)

    assert int(ts_b.step) == 20
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        jax.device_get(ts_full.params),
        jax.device_get(ts_b.params),
    )


def test_resolve_seed_prefers_explicit_then_meta_then_fresh(tmp_path, monkeypatch):
    """--resume_dir must restore the ORIGINAL run's (possibly randomly
    drawn) seed from train_meta.json, or the resumed mask/noise/shuffle
    streams silently diverge from the interrupted run's."""
    import types

    from ml_collections import ConfigDict

    from posterior_matching_tpu.train import resume as R

    cfg = ConfigDict({"seed": 123, "steps": 5})
    R.save_train_meta(str(tmp_path), cfg)

    # 1. explicit config.seed wins over everything
    assert R.resolve_seed(cfg) == 123

    # 2. seed=None + --resume_dir -> seed restored from train_meta.json
    cfg_unseeded = ConfigDict({"seed": None, "steps": 5})
    monkeypatch.setattr(
        R, "flags", types.SimpleNamespace(
            FLAGS=types.SimpleNamespace(resume_dir=str(tmp_path))
        ),
    )
    assert R.resolve_seed(cfg_unseeded) == 123

    # 3. no meta recoverable -> fresh draw (warns, still trains)
    monkeypatch.setattr(
        R, "flags", types.SimpleNamespace(
            FLAGS=types.SimpleNamespace(resume_dir=str(tmp_path / "missing"))
        ),
    )
    s = R.resolve_seed(cfg_unseeded)
    assert isinstance(s, int) and 0 <= s <= int(2e9)

    # 4. no flags at all (library use) -> fresh draw
    monkeypatch.setattr(
        R, "flags", types.SimpleNamespace(FLAGS=types.SimpleNamespace())
    )
    s2 = R.resolve_seed(cfg_unseeded)
    assert isinstance(s2, int)


def test_resume_with_warm_start_and_frozen_subtree(tmp_path):
    """Resuming a warm-started, partially-frozen run must work AND match the
    straight run: the checkpoint's params contain a grafted module the fresh
    loss-fn init does not create (the lookahead trainer's situation), so the
    optimizer's trainable/frozen label tree must be rebuilt from the RESTORED
    param structure, not the fresh init's."""
    x = np.random.RandomState(0).randn(64, 4).astype(np.float32)

    class Lk(nn.Module):
        @nn.compact
        def __call__(self, feats):
            return nn.Dense(4, name="lookahead_head")(feats)

    model = Lk()
    # grafted "backbone" params the loss fn reads but init_fn never creates
    graft = {
        "backbone": {
            "kernel": np.ones((4, 4), np.float32),
            "bias": np.zeros((4,), np.float32),
        }
    }

    def loss_fn(params, state, key, step, batch, is_training):
        feats = batch["features"] @ params["backbone"]["kernel"]
        pred = model.apply(
            {"params": {"lookahead_head": params["lookahead_head"]}}, feats
        )
        return jnp.mean((pred - batch["features"]) ** 2), {}, state

    def init_fn(key, batch):
        return model.init(key, batch["features"])["params"], {}

    def make():
        ds = ArrayDataset({"features": x}, batch_size=16, shuffle=True, seed=3)
        t = Trainer(
            loss_fn, init_fn, optax.adam(1e-2),
            trainable_predicate=lambda mod, name, v: "lookahead" in mod,
            seed=7,
        )
        return ds, t

    ds, t_full = make()
    ts_full = t_full.fit(
        ds, steps=14, validation_freq=100, initial_params=graft
    )

    ds2, t_a = make()
    ts_a = t_a.fit(ds2, steps=7, validation_freq=100, initial_params=graft)
    path = str(tmp_path / "ckpt.pkl")
    save_train_state(path, ts_a)

    ds3, t_b = make()
    ts_b = t_b.fit(
        ds3, steps=14, validation_freq=100,
        resume_from=load_train_state(path),
    )

    # frozen graft untouched; trainable head matches the straight run
    full = jax.device_get(ts_full.params)
    resumed = jax.device_get(ts_b.params)
    np.testing.assert_array_equal(
        resumed["backbone"]["kernel"], graft["backbone"]["kernel"]
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        full, resumed,
    )
