"""Fused Pallas gated-block vs the unfused flax math (interpret mode on CPU).

The fused kernel must match the plain-JAX composition of
concat_elu -> sliced conv -> aux cue -> concat_elu -> dropout -> sliced conv
-> cond -> sigmoid gating -> residual, in BOTH outputs and all gradients
(the backward pass is a hand-written Pallas kernel).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posterior_matching_tpu.ops.gated_block import (
    fused_gated_block,
    plan_taps,
)


def _sliced_conv(x, w, b, kernel_size, vr, vc):
    """The _MaskedConv stride-1 sliced path as plain jax (bit-equivalent to
    models/pixelcnn.py::_MaskedConv)."""
    kh, kw = kernel_size
    (r0, r1), (c0, c1) = vr, vc
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=(
            (kh // 2 - r0, (r1 - 1) - kh // 2),
            (kw // 2 - c0, (c1 - 1) - kw // 2),
        ),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _reference_block(
    x, aux, cond, mask, wa, ba, waux, wb, bb, kernel_size, vr, vc, keep
):
    def concat_elu(z):
        return jax.nn.elu(jnp.concatenate([z, -z], axis=-1))

    h = concat_elu(x)
    h = _sliced_conv(h, wa, ba, kernel_size, vr, vc)
    if aux is not None:
        h = h + concat_elu(aux) @ waux
    h = concat_elu(h)
    h = h * mask / keep
    h = _sliced_conv(h, wb, bb, kernel_size, vr, vc)
    if cond is not None:
        h = h + cond[:, None, None, :]
    act, gate = jnp.split(h, 2, axis=-1)
    return x + jax.nn.sigmoid(gate) * act


def _setup(has_aux, seed=0, b=2, hw=8, f=16):
    rng = np.random.RandomState(seed)
    kernel_size, vr, vc = (3, 3), (0, 2), (0, 3)
    skh, skw = 2, 3
    x = jnp.asarray(rng.randn(b, hw, hw, f), jnp.float32)
    aux = jnp.asarray(rng.randn(b, hw, hw, f), jnp.float32) if has_aux else None
    cond = jnp.asarray(rng.randn(b, 2 * f), jnp.float32)
    mask = jnp.asarray(
        rng.binomial(1, 0.6, (b, hw, hw, 2 * f)), jnp.float32
    )
    wa = jnp.asarray(rng.randn(skh, skw, 2 * f, f) * 0.1, jnp.float32)
    ba = jnp.asarray(rng.randn(f) * 0.1, jnp.float32)
    waux = (
        jnp.asarray(rng.randn(2 * f, f) * 0.1, jnp.float32)
        if has_aux else None
    )
    wb = jnp.asarray(rng.randn(skh, skw, 2 * f, 2 * f) * 0.1, jnp.float32)
    bb = jnp.asarray(rng.randn(2 * f) * 0.1, jnp.float32)
    return (x, aux, cond, mask, wa, ba, waux, wb, bb), (kernel_size, vr, vc)


@pytest.mark.parametrize("has_aux", [False, True])
def test_fused_forward_matches_reference(has_aux):
    args, (ks, vr, vc) = _setup(has_aux)
    x, aux, cond, mask, wa, ba, waux, wb, bb = args

    got = fused_gated_block(
        x, aux, cond, mask, wa, ba, waux, wb, bb,
        kernel_size=ks, valid_rows=vr, valid_cols=vc,
        keep_prob=0.6, interpret=True,
    )
    want = _reference_block(
        x, aux, cond, mask, wa, ba, waux, wb, bb, ks, vr, vc, 0.6
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("has_aux", [False, True])
def test_fused_gradients_match_reference(has_aux):
    args, (ks, vr, vc) = _setup(has_aux, seed=1)
    x, aux, cond, mask, wa, ba, waux, wb, bb = args
    gw = jnp.asarray(
        np.random.RandomState(2).randn(*x.shape), jnp.float32
    )

    def loss_fused(x, aux, cond, wa, ba, waux, wb, bb):
        out = fused_gated_block(
            x, aux, cond, mask, wa, ba, waux, wb, bb,
            kernel_size=ks, valid_rows=vr, valid_cols=vc,
            keep_prob=0.6, interpret=True,
        )
        return jnp.sum(out * gw)

    def loss_ref(x, aux, cond, wa, ba, waux, wb, bb):
        out = _reference_block(
            x, aux, cond, mask, wa, ba, waux, wb, bb, ks, vr, vc, 0.6
        )
        return jnp.sum(out * gw)

    argnums = (0, 2, 3, 4, 6, 7) if not has_aux else (0, 1, 2, 3, 4, 5, 6, 7)
    g_got = jax.grad(loss_fused, argnums=argnums)(
        x, aux, cond, wa, ba, waux, wb, bb
    )
    g_want = jax.grad(loss_ref, argnums=argnums)(
        x, aux, cond, wa, ba, waux, wb, bb
    )
    names = [str(i) for i in argnums]
    for n, a, b_ in zip(names, g_got, g_want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5,
            err_msg=f"grad argnum {n} (has_aux={has_aux})",
        )


def test_plan_taps_rejects_negative_padding():
    with pytest.raises(ValueError):
        plan_taps((3, 3), (2, 3), (0, 3))  # pad_top = -1


def test_fused_block_lowers_for_tpu():
    """AOT-lower the fused kernel's grad for the TPU platform (no device
    needed): catches Mosaic lowering rejections — unsupported primitives
    (expm1, scatter-add), block-shape tiling rules — without risking a
    wedged chip on a live compile."""
    rng = np.random.RandomState(0)
    B, H, W, F = 4, 16, 16, 128
    x = jnp.asarray(rng.randn(B, H, W, F), jnp.float32)
    aux = jnp.asarray(rng.randn(B, H, W, F), jnp.float32)
    cond = jnp.asarray(rng.randn(B, 2 * F), jnp.float32)
    mask = jnp.ones((B, H, W, 2 * F), jnp.float32)
    wa = jnp.asarray(rng.randn(2, 3, 2 * F, F) * 0.05, jnp.float32)
    ba = jnp.zeros(F)
    waux = jnp.asarray(rng.randn(2 * F, F) * 0.05, jnp.float32)
    wb = jnp.asarray(rng.randn(2, 3, 2 * F, 2 * F) * 0.05, jnp.float32)
    bb = jnp.zeros(2 * F)

    def f(x, wa, wb, waux):
        out = fused_gated_block(
            x, aux, cond, mask, wa, ba, waux, wb, bb,
            kernel_size=(3, 3), valid_rows=(0, 2), valid_cols=(0, 3),
            keep_prob=0.5, compute_dtype=jnp.bfloat16,
        )
        return jnp.sum(out ** 2)

    lowered = (
        jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))
        .trace(x, wa, wb, waux)
        .lower(lowering_platforms=("tpu",))
    )
    assert len(lowered.as_text()) > 0
