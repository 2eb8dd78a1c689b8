"""Gated-pair chain kernels (ops/gated_chain.py): interpret-mode equivalence
with the unfused flax path at identical params.

The chain is the PM-VQVAE flagship's consolidation path (BASELINE.md round-3
roadmap); its contract is: same param tree, same logits, same gradients as
``PixelCNN`` with ``fused_chain=False``. Dropout-free paths must match to
float32 tolerance; the dropout path is exercised through injected masks
(mask_mode='input' — the TPU PRNG has no interpret-mode lowering) against a
pure-jnp autodiff reference of one pair.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posterior_matching_tpu.models.pixelcnn import PixelCNN

KW = dict(
    num_indices=12,
    image_shape=(4, 4),
    num_resnet=2,
    num_hierarchies=1,
    num_filters=8,
    receptive_field_dims=(3, 3),
)


def _data(b=2, cond_dim=16, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randint(0, KW["num_indices"], (b, 4, 4)), jnp.int32)
    cond = jnp.asarray(rng.randn(b, cond_dim), jnp.float32)
    return x, cond


def test_param_tree_identical():
    x, cond = _data()
    plain = PixelCNN(dropout=0.0, fused_chain=False, **KW)
    chain = PixelCNN(dropout=0.0, fused_chain="interpret", **KW)
    vp = plain.init(jax.random.PRNGKey(0), x, cond)
    vc = chain.init(jax.random.PRNGKey(0), x, cond)
    assert jax.tree.structure(vp) == jax.tree.structure(vc)
    for (pa, a), (pb, bb_) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(vp), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(vc), key=str),
    ):
        assert a.shape == bb_.shape, (pa, a.shape, bb_.shape)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb_))


def test_forward_matches_unfused():
    x, cond = _data()
    plain = PixelCNN(dropout=0.0, fused_chain=False, **KW)
    chain = PixelCNN(dropout=0.0, fused_chain="interpret", **KW)
    variables = plain.init(jax.random.PRNGKey(0), x, cond)
    lp = plain.apply(variables, x, cond, training=False)
    lc = chain.apply(variables, x, cond, training=False)
    np.testing.assert_allclose(
        np.asarray(lc), np.asarray(lp), rtol=1e-5, atol=1e-5
    )


def test_grads_match_unfused():
    x, cond = _data(b=4)
    plain = PixelCNN(dropout=0.0, fused_chain=False, **KW)
    chain = PixelCNN(dropout=0.0, fused_chain="interpret", **KW)
    variables = plain.init(jax.random.PRNGKey(0), x, cond)

    def loss(model, v, c):
        def f(params):
            out = model.apply({"params": params}, x, c, training=True)
            # weighted sum exercises every logit position
            w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
            return jnp.mean(out * w) + jnp.mean(jnp.square(out))
        return f

    gp = jax.grad(loss(plain, variables, cond))(variables["params"])
    # cond gradient too
    gc = jax.grad(loss(chain, variables, cond))(variables["params"])
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_c = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(gc)
    )
    assert len(flat_p) == len(flat_c)
    for k, a in flat_p:
        b_ = flat_c[jax.tree_util.keystr(k)]
        scale = max(float(np.max(np.abs(np.asarray(a)))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=2e-4, atol=2e-4 * scale,
            err_msg=jax.tree_util.keystr(k),
        )


def test_cond_and_input_grads_match():
    x, cond = _data(b=2)
    plain = PixelCNN(dropout=0.0, fused_chain=False, **KW)
    chain = PixelCNN(dropout=0.0, fused_chain="interpret", **KW)
    variables = plain.init(jax.random.PRNGKey(0), x, cond)

    def f(model):
        def g(c):
            out = model.apply(variables, x, c, training=False)
            return jnp.sum(jnp.tanh(out * 0.1))
        return g

    dp = jax.grad(f(plain))(cond)
    dc = jax.grad(f(chain))(cond)
    np.testing.assert_allclose(
        np.asarray(dc), np.asarray(dp), rtol=1e-4, atol=1e-5
    )


def test_dropout_pair_matches_jnp_reference():
    """One down-pair with injected masks vs a pure-jnp implementation
    (values AND every gradient via autodiff of the reference)."""
    from posterior_matching_tpu.ops.gated_chain import (
        _weight_shapes, gated_pair, PairConfig, plan_taps,
    )

    b, h, w, f, cd = 2, 4, 4, 8, 16
    keep = 0.6
    taps_v = plan_taps((3, 3), (0, 2), (0, 3))
    taps_h = plan_taps((3, 3), (0, 2), (0, 2))
    cfg = PairConfig(
        h=h, w=w, f=f, cond_dim=cd, taps_v=taps_v, taps_h=taps_h,
        keep=keep, cdtype="float32", bc_fwd=1, bc_bwd=1,
        mask_mode="input", interpret=True,
    )
    rng = np.random.RandomState(3)
    mk = lambda shp: jnp.asarray(rng.randn(*shp).astype(np.float32) * 0.3)
    weights = {n: mk(s) for n, s in _weight_shapes(cfg, down=True)}
    xv, xh, skv, skh = (mk((b, h, w, f)) for _ in range(4))
    cond = mk((b, cd))
    masks = tuple(
        jnp.asarray((rng.rand(b, h, w, 2 * f) < keep).astype(np.float32))
        for _ in range(2)
    )

    def ref_conv(x, wflat, taps):
        # [B,H,W,C] -> [B,H,W,Cout] sliced conv via explicit shifts
        cin = x.shape[-1]
        cout = wflat.shape[-1]
        out = jnp.zeros((*x.shape[:-1], cout), jnp.float32)
        t = 0
        for i in range(taps.skh):
            for j in range(taps.skw):
                dr, dc_ = i - taps.pad_top, j - taps.pad_left
                sh = jnp.roll(x, (-dr, -dc_), axis=(1, 2))
                rowm = (jnp.arange(h)[:, None] + dr >= 0) & (
                    jnp.arange(h)[:, None] + dr < h
                )
                colm = (jnp.arange(w)[None, :] + dc_ >= 0) & (
                    jnp.arange(w)[None, :] + dc_ < w
                )
                m = (rowm & colm).astype(jnp.float32)[None, :, :, None]
                out = out + (sh * m) @ wflat[t * cin : (t + 1) * cin]
                t += 1
        return out

    def celu(z):
        return jnp.concatenate([jax.nn.elu(z), jax.nn.elu(-z)], -1)

    def ref_block(x, auxes, m, wa, ba, wb, bb, wc, cond_, taps):
        a1 = ref_conv(celu(x), wa, taps) + ba.reshape(-1)
        for av, wx in auxes:
            a1 = a1 + celu(av) @ wx
        d = celu(a1) * m / keep
        b1 = ref_conv(d, wb, taps) + bb.reshape(-1) + (cond_ @ wc)[
            :, None, None, :
        ]
        act, gate = b1[..., :f], b1[..., f:]
        return x + jax.nn.sigmoid(gate) * act

    def ref_pair(args):
        xv_, xh_, skv_, skh_, cond_, wts = args
        xvn = ref_block(
            xv_, [(skv_, wts["wxv"])], masks[0], wts["wav"], wts["bav"],
            wts["wbv"], wts["bbv"], wts["wcv"], cond_, taps_v,
        )
        xhn = ref_block(
            xh_, [(xvn, wts["wxh_u"]), (skh_, wts["wxh_s"])], masks[1],
            wts["wah"], wts["bah"], wts["wbh"], wts["bbh"], wts["wch"],
            cond_, taps_h,
        )
        return xvn, xhn

    def fused_pair(args):
        xv_, xh_, skv_, skh_, cond_, wts = args
        return gated_pair(
            xv_, xh_, (skv_, skh_), cond_, wts, jnp.zeros((), jnp.int32), 0,
            keep=keep, compute_dtype=jnp.float32, bc_fwd=1, bc_bwd=1,
            mask_mode="input", masks=masks, interpret=True,
        )

    args = (xv, xh, skv, skh, cond, weights)
    rv, rh = ref_pair(args)
    fv, fh = fused_pair(args)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(rv), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fh), np.asarray(rh), rtol=1e-5,
                               atol=1e-5)

    def scal(fn):
        def s(args):
            a, b_ = fn(args)
            return jnp.sum(jnp.sin(a) * 0.7) + jnp.sum(jnp.cos(b_))
        return s

    gr = jax.grad(scal(ref_pair))(args)
    gf = jax.grad(scal(fused_pair))(args)
    for (kr, a), (kf, b_) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gr), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(gf), key=str),
    ):
        scale = max(float(np.max(np.abs(np.asarray(a)))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=2e-5, atol=2e-5 * scale,
            err_msg=str(kr),
        )


def test_dropout_chain_runs_and_masks_vary():
    """Full chain with dropout in input-mask mode: runs, is deterministic
    given the rng, and training=True differs from training=False."""
    x, cond = _data(b=2)
    chain = PixelCNN(dropout=0.5, fused_chain="interpret", **KW)
    variables = chain.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, cond,
    )
    l1 = chain.apply(
        variables, x, cond, training=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    l2 = chain.apply(
        variables, x, cond, training=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    l3 = chain.apply(variables, x, cond, training=False)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert np.abs(np.asarray(l1) - np.asarray(l3)).max() > 1e-4


def test_segment_matches_pair_path(monkeypatch):
    """The multi-level SEGMENT kernels (PM_TPU_CHAIN_SEGMENT > 1) must
    reproduce the validated pair-kernel path exactly: same logits, same
    grads, same dropout-mask consumption order (interpret mode, both
    dropout-free and injected-mask dropout)."""
    x, cond = _data()
    for dropout, kseed in ((0.0, 0), (0.5, 7)):
        model = PixelCNN(dropout=dropout, fused_chain="interpret", **KW)
        variables = model.init(jax.random.PRNGKey(0), x, cond)

        def run(seg):
            monkeypatch.setenv("PM_TPU_CHAIN_SEGMENT", str(seg))

            def f(v, x, c):
                out = model.apply(
                    v, x, c, training=dropout > 0,
                    rngs={"dropout": jax.random.PRNGKey(kseed)},
                )
                return jnp.mean(out ** 2)

            val, grads = jax.value_and_grad(f)(variables, x, cond)
            return val, grads

        v1, g1 = run(1)     # pair kernels
        v2, g2 = run(2)     # segments of 2 (num_resnet=2: one per pass)
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=1e-6
        )
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f"grad mismatch at {pa} (dropout={dropout})",
            )


def test_stream_matches_pair_path(monkeypatch):
    """The STREAMED chain kernels (PM_TPU_CHAIN_SEGMENT=stream: one
    (level, chunk)-grid kernel per direction, weights streamed by the level
    index, xv/xh carry in VMEM scratch) must reproduce the validated
    pair-kernel path exactly: same logits, same grads, same dropout-mask
    consumption order (interpret mode, dropout-free and injected-mask)."""
    x, cond = _data()
    for dropout, kseed in ((0.0, 0), (0.5, 7)):
        model = PixelCNN(dropout=dropout, fused_chain="interpret", **KW)
        variables = model.init(jax.random.PRNGKey(0), x, cond)

        def run(seg):
            monkeypatch.setenv("PM_TPU_CHAIN_SEGMENT", str(seg))

            def f(v, x, c):
                out = model.apply(
                    v, x, c, training=dropout > 0,
                    rngs={"dropout": jax.random.PRNGKey(kseed)},
                )
                return jnp.mean(out ** 2)

            val, grads = jax.value_and_grad(f)(variables, x, cond)
            return val, grads

        v1, g1 = run(1)          # pair kernels
        v2, g2 = run("stream")   # streamed chain
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=1e-6
        )
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f"grad mismatch at {pa} (dropout={dropout})",
            )


def test_stream_matches_pair_path_bfloat16(monkeypatch):
    """At bfloat16 COMPUTE the chain modes are equivalent only to bf16
    tolerance — the stream kernel carries inter-level fwd activations and
    bwd cotangents in compute dtype, the pair path rounds each level
    boundary through HBM, and the segment kernel keeps f32 carries within a
    launch (gated_stream docstring). This pins the bf16 cross-mode claim at
    the flagship compute dtype instead of leaving it untested (ADVICE r3):
    values/grads must agree to a few bf16 ULPs, NOT bitwise."""
    x, cond = _data()
    model = PixelCNN(
        dropout=0.0, fused_chain="interpret", dtype="bfloat16", **KW
    )
    variables = model.init(jax.random.PRNGKey(0), x, cond)

    def run(seg):
        monkeypatch.setenv("PM_TPU_CHAIN_SEGMENT", str(seg))

        def f(v, x, c):
            out = model.apply(v, x, c, training=False)
            return jnp.mean(out ** 2)

        return jax.value_and_grad(f)(variables, x, cond)

    v_pair, g_pair = run(1)
    v_stream, g_stream = run("stream")
    # bf16 has ~8 bits of mantissa: 1e-2 relative = a few ULPs accumulated
    # over the 2*num_resnet=4 level boundaries.
    np.testing.assert_allclose(
        np.asarray(v_pair), np.asarray(v_stream), rtol=1e-2
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_pair),
        jax.tree_util.tree_leaves_with_path(g_stream),
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-2, atol=2e-3, err_msg=f"bf16 grad mismatch at {pa}",
        )
