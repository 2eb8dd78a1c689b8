"""The cached sampler must reproduce the naive raster sampler exactly: same
per-pixel key sequence, same categorical draws (logits agree to float
rounding, far below categorical decision boundaries for generic logits)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posterior_matching_tpu.models.pixelcnn import PixelCNN, pixelcnn_sample
from posterior_matching_tpu.models.pixelcnn_fast import pixelcnn_sample_fast


def _make(num_resnet=2, num_filters=8, num_indices=12, image_shape=(5, 6)):
    model = PixelCNN(
        num_indices=num_indices,
        image_shape=image_shape,
        dropout=0.0,
        num_resnet=num_resnet,
        num_hierarchies=1,
        num_filters=num_filters,
    )
    x0 = jnp.zeros((2, *image_shape), jnp.int32)
    cond = jax.random.normal(jax.random.PRNGKey(7), (2, 10))
    variables = model.init(jax.random.PRNGKey(0), x0, cond)
    return model, variables, cond


@pytest.mark.parametrize("num_resnet", [1, 3])
def test_fast_matches_naive_conditional(num_resnet):
    model, variables, cond = _make(num_resnet=num_resnet)

    def logits_fn(x, c):
        return model.apply(variables, x, conditional_input=c)

    key = jax.random.PRNGKey(42)
    naive = pixelcnn_sample(
        logits_fn, key, 3, model.image_shape, conditional_input=cond
    )
    fast = pixelcnn_sample_fast(
        model, variables["params"], key, 3, conditional_input=cond
    )
    np.testing.assert_array_equal(np.asarray(naive), np.asarray(fast))


def test_fast_matches_naive_unconditional():
    model = PixelCNN(
        num_indices=9, image_shape=(4, 4), dropout=0.0,
        num_resnet=2, num_hierarchies=1, num_filters=8,
    )
    x0 = jnp.zeros((1, 4, 4), jnp.int32)
    variables = model.init(jax.random.PRNGKey(1), x0)

    def logits_fn(x, c):
        return model.apply(variables, x)

    key = jax.random.PRNGKey(3)
    naive = pixelcnn_sample(logits_fn, key, 4, (4, 4))
    fast = pixelcnn_sample_fast(model, variables["params"], key, 4)
    np.testing.assert_array_equal(np.asarray(naive), np.asarray(fast))


def test_fast_sampler_is_jittable():
    model, variables, cond = _make(num_resnet=1)
    fn = jax.jit(
        lambda k, c: pixelcnn_sample_fast(
            model, variables["params"], k, 2, conditional_input=c
        )
    )
    out = fn(jax.random.PRNGKey(0), cond)
    assert out.shape == (2, 2, *model.image_shape)
    assert int(out.min()) >= 0 and int(out.max()) < model.num_indices


def test_fast_rejects_hierarchies():
    model = PixelCNN(
        num_indices=4, image_shape=(4, 4), num_resnet=1,
        num_hierarchies=2, num_filters=8,
    )
    with pytest.raises(ValueError):
        pixelcnn_sample_fast(model, {}, jax.random.PRNGKey(0), 1)
