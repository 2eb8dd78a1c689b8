"""Model-level reference parity: the reference PM-VAE forward vs ours at
IDENTICAL parameters.

The actual reference `PosteriorMatchingVAE` (ResidualMLP backbones +
distribution heads, /root/reference/posterior_matching/models/vae.py) runs
on CPU over the textbook shims; its haiku params are mapped 1:1 into our
flax tree (`<mod>/linear_i/{w,b}` -> `<mod>/Dense_i/{kernel,bias}`), and the
deterministic forward pieces (posterior parameters, reconstruction LL at the
posterior mean, closed-form KL, matching LL) must agree numerically.

The TriL variant additionally exercises the packing-layout freedom: tfp's
`fill_triangular` and our row-major packing are different bijections, so the
raw-parameter columns of the TriL head's Linear are PERMUTED between the
frameworks. The test computes that permutation from the two layouts and
verifies the remapped params induce the same distribution — evidence that a
trained reference checkpoint could be converted exactly.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE_ROOT = "/root/reference"
SHIM_ROOT = os.path.join(os.path.dirname(__file__), "refshims")

for _p in (SHIM_ROOT, REFERENCE_ROOT):
    if _p not in sys.path:
        sys.path.append(_p)


def _map_params(ref_params, dim_latent=None):
    """haiku `{module: {w|b|log_scale: ...}}` -> flax nested params dict."""
    out = {}
    for mod, leaves in ref_params.items():
        parts = mod.split("/")
        top = parts[0]
        node = out.setdefault(top, {})
        if len(parts) == 1:
            # head-level bare params (e.g. decoder_dist log_scale)
            for k, v in leaves.items():
                if k in ("w", "b"):
                    node.setdefault("Dense_0", {})[
                        "kernel" if k == "w" else "bias"
                    ] = np.asarray(v)
                else:
                    node[k] = np.asarray(v)
        else:
            linear = parts[1]
            idx = 0 if linear == "linear" else int(linear.split("_")[1])
            dense = node.setdefault(f"Dense_{idx}", {})
            for k, v in leaves.items():
                dense["kernel" if k == "w" else "bias"] = np.asarray(v)
    return out


_VAE_CONFIG = dict(
    latent_dim=4,
    encoder_net="ResidualMLP",
    encoder_net_config=dict(residual_blocks=1, hidden_units=16),
    decoder_net="ResidualMLP",
    decoder_net_config=dict(residual_blocks=1, hidden_units=16),
    posterior_dist="DiagonalGaussian",
    decoder_dist="IdentityGaussian",
    decoder_dist_config=dict(event_size=6),
    matching_ll_stop_gradients=True,
)


def _ref_probe(cfg, x, b):
    """Deterministic reference forward: z = posterior mean."""
    import haiku as hk
    from posterior_matching.models.vae import PosteriorMatchingVAE as RefVAE

    def fwd(x, b):
        m = RefVAE.from_config(cfg)
        posterior = m.encoder(x, is_training=False)
        z = posterior.mean()
        decoded = m.decoder(z, is_training=False)
        rec_ll = jnp.sum(decoded.log_prob(x), axis=-1)
        kl = posterior.kl_divergence(m.prior)
        x_o_b = jnp.concatenate([x * b, b], axis=-1)
        pp = m.partial_encoder(x_o_b, is_training=False)
        return {
            "z": z,
            "rec_ll": rec_ll,
            "kl": kl,
            "matching_ll": pp.log_prob(z),
        }

    t = hk.transform(fwd)
    params = t.init(jax.random.PRNGKey(0), x, b)
    # ResidualMLP draws a dropout key even at rate 0 -> apply needs a key;
    # values are key-independent in eval mode.
    return params, t.apply(params, jax.random.PRNGKey(9), x, b)


def _our_probe(cfg, flax_params, x, b):
    from posterior_matching_tpu.models.vae import PosteriorMatchingVAE

    model = PosteriorMatchingVAE.from_config(cfg)
    variables = {"params": flax_params}

    posterior = model.apply(variables, x, method=model.encode)
    z = posterior.mean()
    decoded = model.apply(variables, z, method=model.decode)
    rec_ll = jnp.sum(decoded.log_prob(x), axis=-1)
    prior = model.apply(variables, method=model.prior)
    kl = posterior.kl_divergence(prior)
    x_o_b = jnp.concatenate([x * b, b], axis=-1)
    pp = model.apply(variables, x_o_b, method=model.encode_partial)
    return {
        "z": z,
        "rec_ll": rec_ll,
        "kl": kl,
        "matching_ll": pp.log_prob(z),
    }


def test_pm_vae_forward_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(5, 6), jnp.float32)
    b = jnp.asarray(rng.binomial(1, 0.5, (5, 6)), jnp.float32)

    ref_params, ref_out = _ref_probe(_VAE_CONFIG, x, b)
    ours = _our_probe(_VAE_CONFIG, _map_params(ref_params), x, b)

    for k in ("z", "rec_ll", "kl", "matching_ll"):
        np.testing.assert_allclose(
            np.asarray(ours[k]), np.asarray(ref_out[k]),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )


def _tril_permutation(k):
    """perm[my_slot] = ref_slot such that our row-major fill of
    raw[perm] equals tfp's fill_triangular of raw."""
    from tensorflow_probability.substrates.jax import bijectors as shim_b

    m = k * (k + 1) // 2
    # where does tfp put slot s?
    tfp_pos = {}
    for s in range(m):
        e = np.zeros(m, np.float32)
        e[s] = 1.0
        mat = np.asarray(shim_b._fill_triangular(jnp.asarray(e)))
        (i,), (j,) = np.nonzero(mat)
        tfp_pos[(int(i), int(j))] = s
    rows, cols = np.tril_indices(k)
    return np.array(
        [tfp_pos[(int(i), int(j))] for i, j in zip(rows, cols)]
    )


def test_pm_vae_tril_posterior_matches_reference():
    """TriL posterior head: reference raw params pack via tfp's
    fill_triangular; ours pack row-major. Permuting the head Linear's output
    columns converts one checkpoint to the other exactly."""
    cfg = dict(_VAE_CONFIG)
    cfg["posterior_dist"] = "TriLGaussian"
    # reference from_config shares posterior config with the partial head
    latent = cfg["latent_dim"]

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 6), jnp.float32)
    b = jnp.asarray(rng.binomial(1, 0.5, (4, 6)), jnp.float32)

    ref_params, ref_out = _ref_probe(cfg, x, b)
    mapped = _map_params(ref_params)

    perm = _tril_permutation(latent)
    for head in ("posterior_dist", "partial_posterior_dist"):
        dense = mapped[head]["Dense_0"]
        w, bias = dense["kernel"].copy(), dense["bias"].copy()
        w[:, latent:] = w[:, latent:][:, perm]
        bias[latent:] = bias[latent:][perm]
        dense["kernel"], dense["bias"] = w, bias

    ours = _our_probe(cfg, mapped, x, b)
    for k in ("z", "rec_ll", "kl", "matching_ll"):
        np.testing.assert_allclose(
            np.asarray(ours[k]), np.asarray(ref_out[k]),
            rtol=1e-4, atol=1e-4, err_msg=k,
        )


# ---------------------------------------------------------------------------
# Full PixelCNN network forward at identical params
# ---------------------------------------------------------------------------


def _my_pixelcnn_param_order(num_resnet, num_hierarchies, has_cond):
    """The (kind, flax-path) sequence in OUR network's creation order —
    mirrors PixelCNN.__call__ exactly (models/pixelcnn.py)."""
    order = [("embed", ("embed",))]
    for n in ("v_init", "h_init_up", "h_init_left"):
        order.append(("conv", (n, "Conv_0")))

    def gated(tag, stack, down):
        out = [("conv", (f"{tag}_conv_a", "Conv_0"))]
        if down or stack == "horizontal":
            out.append(("dense", (f"{tag}_aux",)))
        out.append(("conv", (f"{tag}_conv_b", "Conv_0")))
        if has_cond:
            out.append(("dense", (f"{tag}_cond_proj",)))
        return out

    for i in range(num_hierarchies):
        for r in range(num_resnet):
            for stack in ("vertical", "horizontal"):
                order += gated(f"up_{i}_{r}_{stack}", stack, down=False)
        if i < num_hierarchies - 1:
            for stack in ("vertical", "horizontal"):
                order.append(("conv", (f"down_sample_{i}_{stack}", "Conv_0")))
    for i in range(num_hierarchies):
        n_res = num_resnet if i == 0 else num_resnet + 1
        for r in range(n_res):
            for stack in ("vertical", "horizontal"):
                order += gated(f"dn_{i}_{r}_{stack}", stack, down=True)
        if i < num_hierarchies - 1:
            for stack in ("vertical", "horizontal"):
                order.append(
                    ("convT", (f"up_sample_{i}_{stack}", "ConvTranspose_0"))
                )
    order.append(("conv", ("logits_conv",)))
    return order


def _map_pixelcnn_params(ref_params, order):
    """Zip reference haiku modules (insertion order == creation order) onto
    our ordered module list; returns the flax params dict."""
    out = {}

    def put(path, leaf, value):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[leaf] = value

    ref_items = list(ref_params.items())
    assert len(ref_items) == len(order), (len(ref_items), len(order))
    for (ref_name, leaves), (kind, path) in zip(ref_items, order):
        if kind == "embed":
            assert "embed" in ref_name, (ref_name, path)
            put(path, "embedding", np.asarray(leaves["embeddings"]))
        elif kind == "dense":
            assert "linear" in ref_name, (ref_name, path)
            put(path, "kernel", np.asarray(leaves["w"]))
            put(path, "bias", np.asarray(leaves["b"]))
        elif kind == "conv":
            assert "conv2_d" in ref_name and "transpose" not in ref_name, (
                ref_name, path,
            )
            put(path, "kernel", np.asarray(leaves["w"]))
            put(path, "bias", np.asarray(leaves["b"]))
        elif kind == "convT":
            assert "transpose" in ref_name, (ref_name, path)
            # hk transpose kernels are (kh, kw, O, I); flax wants HWIO
            put(path, "kernel", np.asarray(leaves["w"]).transpose(0, 1, 3, 2))
            put(path, "bias", np.asarray(leaves["b"]))
    # fix paths: leaves for modules without Conv_0 suffix were nested one
    # level deep ({name: {leaf: v}}) which matches flax for direct modules.
    return out


@pytest.mark.parametrize(
    "num_resnet,num_hierarchies", [(2, 1), (1, 2)]
)
def test_pixelcnn_network_matches_reference(num_resnet, num_hierarchies):
    """The ENTIRE conditional PixelCNN network — embedding, masked stacks,
    gated blocks, (for hierarchies=2) down/up-sampling convs, logits head —
    produces the same logits as the reference's _PixelCNNNetwork at
    identical parameters (mapped by creation order)."""
    import importlib

    import haiku as hk

    ref_pcnn = importlib.import_module("posterior_matching.models.pixel_cnn")
    from posterior_matching_tpu.models.pixelcnn import PixelCNN

    ni, nf = 8, 16
    hdim = 8
    x = jnp.asarray(
        np.random.RandomState(0).randint(0, ni, (2, hdim, hdim)), jnp.int32
    )
    cond = jnp.asarray(np.random.RandomState(1).randn(2, 6), jnp.float32)

    def ref_fwd(idx, c):
        net = ref_pcnn._PixelCNNNetwork(
            num_indices=ni,
            dropout=0.5,
            num_resnet=num_resnet,
            num_hierarchies=num_hierarchies,
            num_filters=nf,
            receptive_field_dims=(3, 3),
        )
        return net(idx, c, training=False).logits

    t = hk.transform(ref_fwd)
    ref_params = t.init(jax.random.PRNGKey(0), x, cond)
    ref_logits = t.apply(ref_params, jax.random.PRNGKey(9), x, cond)

    order = _my_pixelcnn_param_order(num_resnet, num_hierarchies, True)
    mapped = _map_pixelcnn_params(ref_params, order)

    model = PixelCNN(
        num_indices=ni,
        image_shape=(hdim, hdim),
        dropout=0.5,
        num_resnet=num_resnet,
        num_hierarchies=num_hierarchies,
        num_filters=nf,
    )
    logits = model.apply({"params": mapped}, x, cond, training=False)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )


# ---------------------------------------------------------------------------
# VDVAE decoder block: kl and pm_kl at identical params
# ---------------------------------------------------------------------------


def test_vdvae_decoder_block_kls_match_reference():
    """The per-block posterior/prior KL and the posterior-matching
    KL(stop_grad(diag) || TriL) — the pm_kl training signal (reference
    vdvae.py:532-571) — computed by the actual reference block at identical
    parameters. The masked-posterior head's TriL slots are permuted between
    tfp's packing and ours (same freedom as the VAE TriL head)."""
    import importlib

    import haiku as hk

    ref_vdvae = importlib.import_module("posterior_matching.models.vdvae")
    from posterior_matching_tpu.distributions._math import fill_scale_tril
    from posterior_matching_tpu.distributions.normal import (
        MultivariateNormalDiag,
        MultivariateNormalTriL,
    )
    from posterior_matching_tpu.models.vdvae import DecoderBlock

    latent, res, width = 3, 4, 8
    batch = 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, res, res, width), jnp.float32)
    acts = jnp.asarray(rng.randn(batch, res, res, width), jnp.float32)
    macts = jnp.asarray(rng.randn(batch, res, res, width), jnp.float32)

    def ref_fwd(x, acts, macts):
        blk = ref_vdvae.PosteriorMatchingDecoderBlock(
            latent, res, None, 4, width, 1.0
        )
        z, x_out, kl, pm_kl = blk.sample_posterior(x, acts, macts)
        return kl, pm_kl

    t = hk.transform(ref_fwd)
    ref_params = t.init(jax.random.PRNGKey(0), x, acts, macts)
    ref_kl, ref_pm_kl = t.apply(
        ref_params, jax.random.PRNGKey(9), x, acts, macts
    )
    # reference KLs come out of Independent wrappers (event soaks up one
    # batch axis) -> reduce every non-batch axis on both sides
    total = lambda v: np.asarray(jnp.sum(v, axis=tuple(range(1, v.ndim))))
    ref_kl = total(ref_kl)
    ref_pm_kl = total(ref_pm_kl)

    # ---- map params by creation order ----
    # sample_posterior creates exactly the three Blocks' convs (z_proj and
    # the resnet only run in _finish, outside this probe): 3 x 4 convs.
    my_paths = []
    for blk_name in ("posterior", "masked_posterior", "prior"):
        my_paths += [(blk_name, f"c{i}") for i in (1, 2, 3, 4)]

    mapped = {}
    ref_items = list(ref_params.items())
    assert len(ref_items) == len(my_paths), (len(ref_items), len(my_paths))
    for (ref_name, leaves), path in zip(ref_items, my_paths):
        node = mapped
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {
            "kernel": np.asarray(leaves["w"]),
            "bias": np.asarray(leaves["b"]),
        }

    # permute the masked head's raw TriL output channels (tfp -> row-major)
    perm = _tril_permutation(latent)
    c4 = mapped["masked_posterior"]["c4"]
    w, b = c4["kernel"].copy(), c4["bias"].copy()
    w[..., latent:] = w[..., latent:][..., perm]
    b[latent:] = b[latent:][perm]
    c4["kernel"], c4["bias"] = w, b

    # ---- our block ----
    model = DecoderBlock(
        latent_dim=latent, res=res, mixin=None, num_blocks=4,
        width=width, bottleneck_multiple=1.0,
    )
    variables = {"params": mapped}

    def probe(m, x, acts, macts):
        loc, scale = m._posterior(x, acts)
        prior, _ = m._prior(x)
        posterior = MultivariateNormalDiag(loc=loc, scale_diag=scale)
        kl = jnp.sum(posterior.kl_divergence(prior), axis=(1, 2))
        raw = m.masked_posterior_block(
            jnp.concatenate([jax.lax.stop_gradient(x), macts], axis=-1)
        )
        tril = fill_scale_tril(raw[..., latent:], latent)
        masked = MultivariateNormalTriL(
            loc=raw[..., :latent], scale_tril=tril
        )
        pm_kl = jnp.sum(posterior.kl_divergence(masked), axis=(1, 2))
        return kl, pm_kl

    kl, pm_kl = model.apply(variables, x, acts, macts, method=probe)
    np.testing.assert_allclose(np.asarray(kl), ref_kl, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(pm_kl), ref_pm_kl, rtol=1e-4, atol=1e-4
    )


def test_vdvae_encoder_matches_reference():
    """The full VDVAE encoder — block-string pipeline, bottleneck residual
    blocks, avg-pool downsampling, channel padding — produces the same
    per-resolution activation dict as the reference Encoder at identical
    params (reference vdvae.py:287-328). Deterministic (no sampling)."""
    import importlib

    import haiku as hk

    ref_vdvae = importlib.import_module("posterior_matching.models.vdvae")
    from posterior_matching_tpu.models.vdvae import Encoder

    width, blocks = 8, "8x2,8d2,4x1,4d4,1x1"
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 8, 8, 1), jnp.float32
    )

    def ref_fwd(x):
        return ref_vdvae.Encoder(width, blocks, 1.0)(x)

    t = hk.transform(ref_fwd)
    ref_params = t.init(jax.random.PRNGKey(0), x)
    ref_acts = t.apply(ref_params, None, x)

    # creation order: in conv, then 4 convs per parsed block
    from posterior_matching_tpu.models.vdvae import parse_layer_string

    n_blocks = len(parse_layer_string(blocks))
    my_paths = [("in_conv",)]
    for i in range(n_blocks):
        my_paths += [(f"block_{i}", f"c{j}") for j in (1, 2, 3, 4)]

    ref_items = list(ref_params.items())
    assert len(ref_items) == len(my_paths), (len(ref_items), len(my_paths))
    mapped = {}
    for (ref_name, leaves), path in zip(ref_items, my_paths):
        node = mapped
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {
            "kernel": np.asarray(leaves["w"]),
            "bias": np.asarray(leaves["b"]),
        }

    model = Encoder(width=width, blocks=blocks, bottleneck_multiple=1.0)
    acts = model.apply({"params": mapped}, x)

    assert set(acts) == set(ref_acts), (set(acts), set(ref_acts))
    for res in ref_acts:
        np.testing.assert_allclose(
            np.asarray(acts[res]), np.asarray(ref_acts[res]),
            rtol=1e-4, atol=1e-5, err_msg=f"res {res}",
        )


def test_conv_encoder_decoder_match_reference():
    """Conv image backbones (reference networks.py:9-72): outputs match at
    identical params, incl. the VALID-padding rules (last encoder layer,
    first decoder layer) and transposed-conv semantics."""
    import importlib

    import haiku as hk

    ref_nets = importlib.import_module("posterior_matching.models.networks")
    from posterior_matching_tpu.models.networks import (
        ConvDecoder,
        ConvEncoder,
    )

    layers_enc = [(8, 3, 2), (16, 3, 2), (32, 7, 1)]
    layers_dec = [(32, 7, 1), (16, 3, 2), (8, 3, 2), (1, 3, 1)]
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 28, 28, 1), jnp.float32
    )
    z = jnp.asarray(np.random.RandomState(1).randn(2, 32), jnp.float32)

    # ---- encoder ----
    t = hk.transform(lambda x: ref_nets.ConvEncoder(layers_enc)(x))
    ref_params = t.init(jax.random.PRNGKey(0), x)
    ref_out = t.apply(ref_params, None, x)

    mapped = {}
    for i, (name, leaves) in enumerate(ref_params.items()):
        mapped[f"Conv_{i}"] = {
            "kernel": np.asarray(leaves["w"]),
            "bias": np.asarray(leaves["b"]),
        }
    out = ConvEncoder(layers_enc).apply({"params": mapped}, x)
    assert out.shape == ref_out.shape, (out.shape, ref_out.shape)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-5
    )

    # ---- decoder ----
    t = hk.transform(lambda z: ref_nets.ConvDecoder(layers_dec)(z))
    ref_params = t.init(jax.random.PRNGKey(0), z)
    ref_out = t.apply(ref_params, None, z)

    mapped = {}
    for i, (name, leaves) in enumerate(ref_params.items()):
        mapped[f"ConvTranspose_{i}"] = {
            # hk transpose kernels (kh, kw, O, I) -> flax HWIO
            "kernel": np.asarray(leaves["w"]).transpose(0, 1, 3, 2),
            "bias": np.asarray(leaves["b"]),
        }
    out = ConvDecoder(layers_dec).apply({"params": mapped}, z)
    assert out.shape == ref_out.shape, (out.shape, ref_out.shape)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-5
    )


def test_autoregressive_gmm_log_prob_matches_reference():
    """The AutoregressiveGMM head: the reference scans D sequential
    teacher-forced conditionals (distributions.py:152-166); ours evaluates
    all D in one batched forward. At identical params the log-probs must be
    equal."""
    import importlib

    import haiku as hk

    ref_dists = importlib.import_module(
        "posterior_matching.models.distributions"
    )
    from posterior_matching_tpu.models.heads import AutoregressiveGMMHead

    event, comps, hidden, blocks = 4, 3, 16, 1
    rng = np.random.RandomState(0)
    ctx = jnp.asarray(rng.randn(3, 6), jnp.float32)
    value = jnp.asarray(rng.randn(3, event), jnp.float32)

    def ref_fwd(ctx, value):
        head = ref_dists.AutoregressiveGMM(
            event, num_components=comps,
            residual_blocks=blocks, hidden_units=hidden,
        )
        return head(ctx).log_prob(value)

    t = hk.transform(ref_fwd)
    ref_params = t.init(jax.random.PRNGKey(0), ctx, value)
    ref_lp = t.apply(ref_params, jax.random.PRNGKey(9), ctx, value)

    # creation order: ResidualMLP linears (1 + 2*blocks), then the GMM head
    # Linear -> our pure-MLP pytree {in, blocks[i].a/b, out}
    ref_items = list(ref_params.items())
    assert len(ref_items) == 1 + 2 * blocks + 1, [k for k, _ in ref_items]
    leaves = [
        {"kernel": np.asarray(v["w"]), "bias": np.asarray(v["b"])}
        for _, v in ref_items
    ]
    flat = {}
    name = "ar_net"
    order = [("in", leaves[0])]
    for i in range(blocks):
        order += [
            (f"block{i}_a", leaves[1 + 2 * i]),
            (f"block{i}_b", leaves[2 + 2 * i]),
        ]
    order.append(("out", leaves[-1]))
    for pname, wb in order:
        flat[f"{name}_{pname}_w"] = wb["kernel"]
        flat[f"{name}_{pname}_b"] = wb["bias"]

    head = AutoregressiveGMMHead(
        event_size=event, num_components=comps,
        residual_blocks=blocks, hidden_units=hidden,
    )
    dist = head.apply({"params": flat}, ctx)
    lp = dist.log_prob(value)
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(ref_lp), rtol=1e-4, atol=1e-4
    )


def test_vade_elbo_and_clusters_match_reference(monkeypatch):
    """The VaDE ELBO — including the reference's unnormalized-prior quirk
    (raw mixture logits in e_log_p_c, vade.py:128-139) — and cluster
    responsibilities match the reference at identical params. Sampling is
    made deterministic by patching both frameworks' MVNDiag.sample to the
    posterior mean."""
    import importlib

    import haiku as hk

    ref_vade_mod = importlib.import_module("posterior_matching.models.vade")
    shim_d = importlib.import_module(
        "tensorflow_probability.substrates.jax.distributions"
    )
    import posterior_matching_tpu.distributions.normal as my_normal
    from posterior_matching_tpu.models.vade import VADE

    # deterministic z on both sides
    def _mean_sample(self, _key, sample_shape=()):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        return jnp.broadcast_to(
            self.mean(), tuple(sample_shape) + self.mean().shape
        )

    monkeypatch.setattr(
        shim_d.MultivariateNormalDiag, "sample",
        lambda self, seed=None, sample_shape=(): _mean_sample(
            self, seed, sample_shape
        ),
    )
    monkeypatch.setattr(
        my_normal.MultivariateNormalDiag, "sample", _mean_sample
    )

    cfg = dict(
        num_components=3, latent_dim=4,
        encoder_net="ResidualMLP",
        encoder_net_config=dict(residual_blocks=1, hidden_units=16),
        decoder_net="ResidualMLP",
        decoder_net_config=dict(residual_blocks=1, hidden_units=16),
        decoder_dist="IdentityGaussian",
        decoder_dist_config=dict(event_size=6),
    )
    x = jnp.asarray(np.random.RandomState(0).randn(5, 6), jnp.float32)

    def ref_fwd(x):
        m = ref_vade_mod.VADE.from_config(cfg)
        return m.elbo(x), m.predict_cluster(x, num_samples=2)

    t = hk.transform(ref_fwd)
    ref_params = t.init(jax.random.PRNGKey(0), x)
    # randomize the GMM prior so the quirk term is non-trivial
    ref_params = dict(ref_params)
    gmm = dict(ref_params["vade"])
    rng = np.random.RandomState(7)
    gmm["logits"] = jnp.asarray(rng.randn(3), jnp.float32)
    gmm["mu"] = jnp.asarray(rng.randn(3, 4), jnp.float32)
    gmm["log_scale"] = jnp.asarray(rng.randn(3, 4) * 0.3, jnp.float32)
    ref_params["vade"] = gmm
    ref_elbo, ref_q = t.apply(ref_params, jax.random.PRNGKey(9), x)

    # ---- map params ----
    mapped = {}
    for mod, leaves in ref_params.items():
        if mod == "vade":
            for k, v in leaves.items():
                mapped[k] = np.asarray(v)
        elif mod == "vade/~/diagonal_gaussian/linear":
            mapped["posterior_dist"] = {
                "Dense_0": {
                    "kernel": np.asarray(leaves["w"]),
                    "bias": np.asarray(leaves["b"]),
                }
            }
        else:
            parts = mod.split("/")
            node = mapped.setdefault(parts[0], {})
            if len(parts) == 1:
                for k, v in leaves.items():
                    if k in ("w", "b"):
                        node.setdefault("Dense_0", {})[
                            "kernel" if k == "w" else "bias"
                        ] = np.asarray(v)
                    else:
                        node[k] = np.asarray(v)
            else:
                idx = 0 if parts[1] == "linear" else int(
                    parts[1].split("_")[1]
                )
                node.setdefault(f"Dense_{idx}", {})
                for k, v in leaves.items():
                    node[f"Dense_{idx}"][
                        "kernel" if k == "w" else "bias"
                    ] = np.asarray(v)

    model = VADE.from_config(cfg)
    variables = {"params": mapped}
    elbo = model.apply(
        variables, x, method=model.elbo,
        rngs={"sample": jax.random.PRNGKey(1)},
    )
    q = model.apply(
        variables, x, method=model.predict_cluster,
        rngs={"sample": jax.random.PRNGKey(1)},
    )
    np.testing.assert_allclose(
        np.asarray(elbo), np.asarray(ref_elbo), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(q), np.asarray(ref_q), rtol=1e-4, atol=1e-4
    )


def test_lookahead_info_gains_match_reference():
    """Lookahead expected_info_gains (reference lookahead.py:204-227):
    deterministic entropy-difference estimator at identical params, incl.
    the -inf masking of already-observed features and the full-encoder
    current-entropy choice."""
    import importlib

    import haiku as hk

    ref_la_mod = importlib.import_module(
        "posterior_matching.models.lookahead"
    )
    from posterior_matching_tpu.models.lookahead import LookaheadPosterior

    pm_cfg = dict(
        latent_dim=4,
        encoder_net="ResidualMLP",
        encoder_net_config=dict(residual_blocks=1, hidden_units=16),
        decoder_net="ResidualMLP",
        decoder_net_config=dict(residual_blocks=1, hidden_units=16),
        posterior_dist="DiagonalGaussian",
        decoder_dist="IdentityGaussian",
        decoder_dist_config=dict(event_size=6),
    )
    la_cfg = dict(num_features=6)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(6), jnp.float32)
    b = jnp.asarray([1, 0, 0, 1, 0, 1], jnp.float32)

    def ref_fwd(x, b):
        m = ref_la_mod.LookaheadPosterior.from_config(la_cfg, pm_cfg)
        return m.expected_info_gains(x, b)

    t = hk.transform(ref_fwd)
    ref_params = t.init(jax.random.PRNGKey(0), x, b)
    ref_gains = t.apply(ref_params, jax.random.PRNGKey(9), x, b)

    mapped = {"pm_vae": {}}
    for mod, leaves in ref_params.items():
        wb = {
            "kernel": np.asarray(leaves["w"]),
            "bias": np.asarray(leaves["b"]),
        }
        if mod == "lookahead_posterior/~/lookahead_block/linear":
            mapped["lookahead_block"] = {"Dense_0": wb}
            continue
        parts = mod.split("/")
        idx = 0 if parts[1] == "linear" else int(parts[1].split("_")[1])
        if parts[0] in ("encoder_net", "posterior_dist"):
            node = mapped["pm_vae"].setdefault(parts[0], {})
        else:
            node = mapped.setdefault(parts[0], {})
        node[f"Dense_{idx}"] = wb

    model = LookaheadPosterior.from_config(la_cfg, pm_cfg)
    gains = model.apply(
        {"params": mapped}, x, b, method=model.expected_info_gains
    )
    got, want = np.asarray(gains), np.asarray(ref_gains)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.isneginf(got), np.isneginf(want))
    finite = np.isfinite(want)
    np.testing.assert_allclose(
        got[finite], want[finite], rtol=1e-4, atol=1e-5
    )


def test_pm_vae_is_log_prob_matches_reference():
    """The AC-LL protocol itself: both importance-sampled estimators
    (log p(x), log p(x_u|x_o) — reference vae.py:171-226) must agree at
    identical params up to IS estimator noise. This certifies that the
    BASELINE.md ours-vs-reference AC-LL tables compare the same quantity,
    not two different estimators."""
    import haiku as hk
    from posterior_matching.models.vae import PosteriorMatchingVAE as RefVAE

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(6, 6), jnp.float32)
    b = jnp.asarray(rng.binomial(1, 0.5, (6, 6)), jnp.float32)
    n = 4096  # IS noise at this size << the 0.05-nat tolerance below

    def ref_fwd(x, b):
        m = RefVAE.from_config(_VAE_CONFIG)
        return m.is_log_prob(x, b, num_samples=n)

    t = hk.transform(ref_fwd)
    ref_params = t.init(jax.random.PRNGKey(0), x, b)

    from posterior_matching_tpu.models.vae import PosteriorMatchingVAE

    model = PosteriorMatchingVAE.from_config(_VAE_CONFIG)
    variables = {"params": _map_params(ref_params)}

    # Different RNG realizations -> compare estimates, not samples. The IS
    # weights on this near-init model are heavy-tailed: the REFERENCE'S OWN
    # seed-to-seed spread at n=4096 is up to ~0.6 nats per instance
    # (measured). Average each estimator over 4 seeds and compare per
    # instance within 0.5 nats, plus the over-instances mean within 0.15.
    seeds = (11, 12, 13, 14)
    ref_px, ref_pugo = (
        np.mean([np.asarray(v) for v in vs], axis=0)
        for vs in zip(*(t.apply(ref_params, jax.random.PRNGKey(s), x, b)
                        for s in seeds))
    )
    our_px, our_pugo = (
        np.mean([np.asarray(v) for v in vs], axis=0)
        for vs in zip(*(model.apply(
            variables, x, b, n,
            method=model.is_log_prob,
            rngs={"sample": jax.random.PRNGKey(100 + s)},
        ) for s in seeds))
    )

    for ours, ref, name in (
        (our_px, ref_px, "log p(x)"),
        (our_pugo, ref_pugo, "log p(x_u|x_o)"),
    ):
        np.testing.assert_allclose(ours, ref, atol=0.5, rtol=0, err_msg=name)
        assert abs(float(np.mean(ours - ref))) < 0.15, (
            name, np.mean(ours - ref),
        )
