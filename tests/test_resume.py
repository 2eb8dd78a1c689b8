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
