"""PixelCNN tests: causality of the masked stacks, log_prob, sampling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posterior_matching_tpu.models.pixelcnn import PixelCNN, pixelcnn_sample


@pytest.fixture(scope="module")
def small_pixelcnn():
    model = PixelCNN(
        num_indices=8,
        image_shape=(5, 5),
        dropout=0.0,
        num_resnet=2,
        num_hierarchies=1,
        num_filters=16,
    )
    x = jnp.zeros((2, 5, 5), jnp.int32)
    cond = jnp.zeros((2, 6))
    variables = model.init(jax.random.PRNGKey(0), x, cond)
    return model, variables


def test_logits_shape(small_pixelcnn):
    model, variables = small_pixelcnn
    x = jnp.zeros((3, 5, 5), jnp.int32)
    cond = jnp.ones((3, 6))
    logits = model.apply(variables, x, cond)
    assert logits.shape == (3, 5, 5, 8)


def test_causality(small_pixelcnn):
    """Changing pixel (i, j) must not affect logits at raster positions
    <= (i, j) — the autoregressive property the kernel masks implement."""
    model, variables = small_pixelcnn
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 8, (1, 5, 5)), jnp.int32)
    base = np.asarray(model.apply(variables, x, None))

    for (pi, pj) in [(2, 2), (0, 4), (4, 0)]:
        x2 = x.at[0, pi, pj].set((int(x[0, pi, pj]) + 3) % 8)
        out = np.asarray(model.apply(variables, x2, None))
        diff = np.abs(out - base).sum(-1)[0]  # [5, 5]
        flat_pos = pi * 5 + pj
        for i in range(5):
            for j in range(5):
                if i * 5 + j <= flat_pos:
                    assert diff[i, j] < 1e-5, (
                        f"logits at {(i, j)} depend on future pixel {(pi, pj)}"
                    )


def test_conditional_input_changes_logits(small_pixelcnn):
    model, variables = small_pixelcnn
    x = jnp.zeros((1, 5, 5), jnp.int32)
    l1 = model.apply(variables, x, jnp.zeros((1, 6)))
    l2 = model.apply(variables, x, jnp.ones((1, 6)))
    assert np.abs(np.asarray(l1) - np.asarray(l2)).max() > 1e-6


def test_log_prob_matches_manual(small_pixelcnn):
    model, variables = small_pixelcnn
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randint(0, 8, (2, 5, 5)), jnp.int32)
    cond = jnp.asarray(rng.randn(2, 6), jnp.float32)
    ll = model.apply(variables, x, cond, method=model.log_prob)
    logits = model.apply(variables, x, cond)
    logp = jax.nn.log_softmax(logits, -1)
    want = np.take_along_axis(
        np.asarray(logp), np.asarray(x)[..., None], axis=-1
    )[..., 0].sum((1, 2))
    np.testing.assert_allclose(np.asarray(ll), want, rtol=1e-5)
    assert ll.shape == (2,)


def test_sampling_shapes_and_range(small_pixelcnn):
    model, variables = small_pixelcnn
    cond = jnp.asarray(np.random.RandomState(2).randn(3, 6), jnp.float32)

    def logits_fn(x, c):
        return model.apply(variables, x, c)

    samples = pixelcnn_sample(
        logits_fn, jax.random.PRNGKey(0), 2, (5, 5), conditional_input=cond
    )
    assert samples.shape == (2, 3, 5, 5)
    s = np.asarray(samples)
    assert s.min() >= 0 and s.max() < 8


def test_sampling_is_jittable(small_pixelcnn):
    model, variables = small_pixelcnn
    cond = jnp.ones((2, 6))

    @jax.jit
    def run(key):
        return pixelcnn_sample(
            lambda x, c: model.apply(variables, x, c),
            key, 2, (5, 5), conditional_input=cond,
        )

    s = run(jax.random.PRNGKey(1))
    assert s.shape == (2, 2, 5, 5)


def test_sliced_kernel_equals_masked_conv():
    """The sliced-kernel fast path of _MaskedConv must agree with the
    reference semantics (0/1 mask multiplied into a full-window SAME conv)
    for every (kernel, valid-region) combination the network uses."""
    from flax import linen as nn

    from posterior_matching_tpu.models.networks import _trunc_normal_fan_in
    from posterior_matching_tpu.models.pixelcnn import (
        _kernel_mask,
        _MaskedConv,
    )

    cases = [
        # (kernel_size, valid_rows, valid_cols) — v_init, h_init_up,
        # h_init_left, vertical gated, horizontal gated (3x3 field)
        ((5, 3), (0, 2), (0, 3)),
        ((3, 3), (0, 1), (0, 3)),
        ((3, 3), (0, 2), (0, 1)),
        ((3, 3), (0, 2), (0, 3)),
        ((3, 3), (0, 2), (0, 2)),
    ]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 7, 4))
    for ksize, vr, vc in cases:
        fast = _MaskedConv(6, ksize, vr, vc)
        fvars = fast.init(jax.random.PRNGKey(2), x)

        ref = nn.Conv(
            6, ksize, padding="SAME",
            mask=jnp.broadcast_to(
                jnp.asarray(_kernel_mask(ksize, vr, vc)), (*ksize, 4, 6)
            ),
            kernel_init=_trunc_normal_fan_in,
        )
        rvars = {"params": fvars["params"]["Conv_0"]}
        np.testing.assert_allclose(
            fast.apply(fvars, x), ref.apply(rvars, x), rtol=1e-6, atol=1e-6
        )


def test_sliced_kernel_gradients_match_masked():
    """Gradients through the sliced path must equal the masked-conv
    gradients (zero on masked taps, identical elsewhere)."""
    from flax import linen as nn

    from posterior_matching_tpu.models.networks import _trunc_normal_fan_in
    from posterior_matching_tpu.models.pixelcnn import (
        _kernel_mask,
        _MaskedConv,
    )

    ksize, vr, vc = (3, 3), (0, 2), (0, 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 5, 3))
    fast = _MaskedConv(4, ksize, vr, vc)
    fvars = fast.init(jax.random.PRNGKey(2), x)
    ref = nn.Conv(
        4, ksize, padding="SAME",
        mask=jnp.broadcast_to(
            jnp.asarray(_kernel_mask(ksize, vr, vc)), (*ksize, 3, 4)
        ),
        kernel_init=_trunc_normal_fan_in,
    )

    gf = jax.grad(lambda v: jnp.sum(fast.apply(v, x) ** 2))(fvars)
    gr = jax.grad(
        lambda v: jnp.sum(ref.apply(v, x) ** 2)
    )({"params": fvars["params"]["Conv_0"]})
    for name in ("kernel", "bias"):
        np.testing.assert_allclose(
            gf["params"]["Conv_0"][name], gr["params"][name],
            rtol=1e-5, atol=1e-6,
        )


def test_fused_network_matches_unfused():
    """The full PixelCNN with the fused Pallas CHAIN (segment kernels,
    interpret mode) must produce the same params tree AND the same logits
    as the unfused path — checkpoints are interchangeable. (The retired
    per-block kernel's coverage moved here to the chain path; see
    ops/gated_block.py docstring.)"""
    kwargs = dict(
        num_indices=8,
        image_shape=(8, 8),
        dropout=0.5,
        num_resnet=2,
        num_hierarchies=1,
        num_filters=16,
    )
    plain = PixelCNN(**kwargs)
    fused = PixelCNN(fused_chain="interpret", **kwargs)

    x = jnp.asarray(
        np.random.RandomState(0).randint(0, 8, (2, 8, 8)), jnp.int32
    )
    cond = jnp.asarray(np.random.RandomState(1).randn(2, 6), jnp.float32)

    v_plain = plain.init(jax.random.PRNGKey(0), x, cond)
    v_fused = fused.init(jax.random.PRNGKey(0), x, cond)

    # identical param trees (paths, shapes, values)
    flat_p = jax.tree_util.tree_flatten_with_path(v_plain)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(v_fused)[0]
    assert [p for p, _ in flat_p] == [p for p, _ in flat_f]
    for (path, a), (_, b) in zip(flat_p, flat_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), err_msg=str(path)
        )

    # same logits with EITHER variables in eval mode (no dropout)
    l_plain = plain.apply(v_plain, x, cond, training=False)
    l_fused = fused.apply(v_plain, x, cond, training=False)
    np.testing.assert_allclose(
        np.asarray(l_fused), np.asarray(l_plain), rtol=1e-4, atol=1e-4
    )

    # training mode: gradients flow through every param on the fused path
    def loss(params, impl):
        out = impl.apply(
            {"params": params}, x, cond, training=True,
            rngs={"dropout": jax.random.PRNGKey(7)},
        )
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(v_plain["params"], fused)
    leaves = jax.tree_util.tree_flatten_with_path(g)[0]
    zero = [jax.tree_util.keystr(p) for p, l in leaves
            if float(np.abs(np.asarray(l)).max()) == 0.0]
    assert not zero, f"dead gradients through fused path: {zero}"
