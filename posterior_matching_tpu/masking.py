"""On-device mask generation.

The reference generates observed-feature masks on the host with stateful
numpy/PIL generators injected into tf.data via ``tf.py_function`` (reference
``posterior_matching/masking.py:9-350``, hook at :342) — a per-batch Python
callback on the input-pipeline critical path. Here every generator is a pure
``(key, shape) -> mask`` JAX function, so mask sampling is traced into the same
XLA program as the train step: it fuses with the ``x*b`` / ``concat([x*b, b])``
encoder prologue and runs on the accelerator's VPU with zero host round trips.

Distributional parity notes (each generator matches the reference's sampling
distribution; bit-exactness is impossible and not needed since the reference
itself uses unseeded RNG for training masks):

- ``UniformMaskGenerator`` (reference :50): #observed ``q`` uniform over
  ``{0..d-1}`` (or ``l + {0..h-1}`` with bounds), then a uniformly random
  subset of size ``q`` — realized here via ranks of iid uniforms.
- ``RectangleMaskGenerator`` (reference :107): rejection loop on the rectangle
  area is replaced by best-of-K candidate selection with a deterministic
  in-bounds fallback; K is large enough that the fallback probability is
  negligible.
- ``RandomPatternMaskGenerator`` (reference :177): the 10000x10000 bicubic
  noise canvas is replaced by a smaller (default 2048) canvas with identical
  local statistics (the field is stationary), generated once per generator;
  density rejection again via best-of-K. Candidate densities come from a
  host-precomputed summed-area table (four gathered corners per candidate,
  exact integer counts) so only each batch element's WINNING crop is ever
  sliced from the canvas — the [B, K, H, W] candidate-crop gather this
  replaces dominated the measured mask-prologue cost on the CelebA step.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MaskFn = Callable[[jax.Array, Sequence[int]], jnp.ndarray]

_REJECTION_CANDIDATES = 32


def _flatten_image_shape(shape: Sequence[int]) -> Tuple[int, int, int]:
    assert len(shape) == 4, (
        f"expected shape [batch, height, width, channels], got {shape}"
    )
    b, h, w, _ = shape
    return b, h, w


# ---------------------------------------------------------------------------
# Feature-level generators
# ---------------------------------------------------------------------------


def uniform_mask(
    key: jax.Array,
    shape: Sequence[int],
    bounds: Optional[Tuple[float, float]] = None,
) -> jnp.ndarray:
    """Uniformly random #observed, then a uniform subset of that size.

    Matches reference ``UniformMaskGenerator`` (masking.py:50-81): for each row
    draw ``q ~ Uniform{0..d-1}`` (or ``int(d*lo) + Uniform{0..int(d*hi)-1}``
    with bounds) and observe a uniformly random size-``q`` subset.
    """
    b = shape[0]
    d = int(np.prod(shape[1:]))
    k_q, k_sub = jax.random.split(key)
    if bounds is None:
        q = jax.random.randint(k_q, (b,), 0, d)
    else:
        lo = int(d * bounds[0])
        hi = int(d * bounds[1])
        q = lo + jax.random.randint(k_q, (b,), 0, hi)
    # ranks of iid uniforms give a uniformly random permutation per row;
    # mask = (rank < q) observes a uniform random subset of size q.
    u = jax.random.uniform(k_sub, (b, d))
    ranks = jnp.argsort(jnp.argsort(u, axis=-1), axis=-1)
    mask = (ranks < q[:, None]).astype(jnp.float32)
    return mask.reshape(shape)


def bernoulli_mask(
    key: jax.Array, shape: Sequence[int], p: float = 0.5
) -> jnp.ndarray:
    """iid Bernoulli(p) per feature (reference BernoulliMaskGenerator:84)."""
    return jax.random.bernoulli(key, p, tuple(shape)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Image-level generators (masks have shape [B, H, W, 1])
# ---------------------------------------------------------------------------


def image_bernoulli_mask(
    key: jax.Array, shape: Sequence[int], p: float = 0.2
) -> jnp.ndarray:
    """iid Bernoulli(p) per pixel (reference ImageBernoulliMaskGenerator:94)."""
    b, h, w = _flatten_image_shape(shape)
    return jax.random.bernoulli(key, p, (b, h, w, 1)).astype(jnp.float32)


def _rect_to_mask(
    x1: jnp.ndarray, y1: jnp.ndarray, x2: jnp.ndarray, y2: jnp.ndarray,
    h: int, w: int,
) -> jnp.ndarray:
    """Batched [B] rectangle coords -> [B, H, W, 1] masks (0 inside rect,
    inclusive of both corners, matching reference :137)."""
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    inside = (
        (ys >= y1[:, None, None])
        & (ys <= y2[:, None, None])
        & (xs >= x1[:, None, None])
        & (xs <= x2[:, None, None])
    )
    return (1.0 - inside.astype(jnp.float32))[..., None]


def _static_valid_rectangle(
    h: int, w: int, min_prop: float, max_prop: float
) -> Tuple[int, int, int, int]:
    """A deterministic rectangle whose area satisfies the bounds (fallback for
    the vanishingly rare case where all random candidates are rejected)."""
    target = min(max(min_prop, 0.0) + 1e-6, max_prop)
    area = max(1, int(np.ceil(target * h * w)))
    rh = min(h, int(np.ceil(np.sqrt(area))))
    rw = min(w, int(np.ceil(area / rh)))
    # (x1, y1, x2, y2) inclusive
    return 0, 0, rw - 1, rh - 1


def rectangle_mask(
    key: jax.Array,
    shape: Sequence[int],
    min_prop: float = 0.3,
    max_prop: float = 1.0,
) -> jnp.ndarray:
    """Random rectangle with rejection on area in [min_prop, max_prop]
    (reference RectangleMaskGenerator:107-140), realized as first-valid-of-K
    candidates plus a deterministic valid fallback."""
    b, h, w = _flatten_image_shape(shape)
    k = _REJECTION_CANDIDATES
    kx, ky = jax.random.split(key)
    xs = jax.random.randint(kx, (b, k, 2), 0, w)
    ys = jax.random.randint(ky, (b, k, 2), 0, h)
    x1, x2 = jnp.min(xs, -1), jnp.max(xs, -1)
    y1, y2 = jnp.min(ys, -1), jnp.max(ys, -1)
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    sqr = w * h
    valid = (area >= min_prop * sqr) & (area <= max_prop * sqr)
    # index of first valid candidate; if none, k-1 gets overwritten by fallback
    first = jnp.argmax(valid, axis=-1)
    any_valid = jnp.any(valid, axis=-1)
    fx1, fy1, fx2, fy2 = _static_valid_rectangle(h, w, min_prop, max_prop)
    pick = lambda v, f: jnp.where(
        any_valid, jnp.take_along_axis(v, first[:, None], -1)[:, 0], f
    )
    return _rect_to_mask(
        pick(x1, fx1), pick(y1, fy1), pick(x2, fx2), pick(y2, fy2), h, w
    )


def fixed_rectangle_mask(
    key: jax.Array, shape: Sequence[int], y1: int, x1: int, y2: int, x2: int
) -> jnp.ndarray:
    """Fixed rectangle (reference FixedRectangleMaskGenerator:143; note the
    reference uses *exclusive* slice ends there, unlike RectangleMask)."""
    b, h, w = _flatten_image_shape(shape)
    mask = np.ones((1, h, w, 1), np.float32)
    mask[:, y1:y2, x1:x2, :] = 0.0
    return jnp.broadcast_to(jnp.asarray(mask), (b, h, w, 1))


def square_mask(
    key: jax.Array, shape: Sequence[int], size: int
) -> jnp.ndarray:
    """Random square of the given size, per batch element (reference
    SquareMaskGenerator:160; exclusive ends)."""
    b, h, w = _flatten_image_shape(shape)
    kx, ky = jax.random.split(key)
    x = jax.random.randint(kx, (b,), 0, w - size)
    y = jax.random.randint(ky, (b,), 0, h - size)
    return _rect_to_mask(x, y, x + size - 1, y + size - 1, h, w)


class _PatternCanvas:
    """Lazily-built bicubic noise canvas shared by RandomPattern generators."""

    _cache = {}

    @classmethod
    def get(cls, canvas_size: int, resolution: float, density: float, seed: int):
        cache_key = (canvas_size, resolution, density, seed)
        if cache_key not in cls._cache:
            from PIL import Image

            low_size = max(2, int(resolution * canvas_size))
            rng = np.random.RandomState(seed)
            low = rng.uniform(0, 1, size=(low_size, low_size)).astype(np.float32)
            # host-side bicubic upscale (same as the reference's PIL resize,
            # masking.py:195-197); the thresholded canvas embeds into jitted
            # programs as a plain host constant
            pattern = np.asarray(
                Image.fromarray(low, mode="F").resize(
                    (canvas_size, canvas_size), Image.BICUBIC
                )
            )
            # cached as numpy: tracing embeds it as a plain program constant.
            # uint8 (not f32): the random crops are HBM-bandwidth-bound
            # gathers, so a 1-byte canvas moves 4x less data (and the
            # embedded constant shrinks 16MB -> 4MB at the default size);
            # crops are cast to f32 AFTER slicing.
            cls._cache[cache_key] = (pattern < density).astype(np.uint8)
        return cls._cache[cache_key]

    _sat_cache = {}

    @classmethod
    def get_sat(cls, canvas_size, resolution, density, seed):
        """Summed-area table of the thresholded canvas: ``sat[i, j]`` = number
        of ones in ``canvas[:i, :j]`` (int32, shape ``[S+1, S+1]``). Lets the
        density-rejection pass score every candidate crop with FOUR gathered
        corners instead of materializing the full ``[B, K, H, W]`` crop stack
        (the measured ~2 ms mask-prologue cost on the CelebA step is dominated
        by exactly those candidate-crop window gathers)."""
        cache_key = (canvas_size, resolution, density, seed)
        if cache_key not in cls._sat_cache:
            canvas = cls.get(canvas_size, resolution, density, seed)
            sat = np.zeros((canvas_size + 1, canvas_size + 1), np.int32)
            # int64 accumulation, then cast (max count 2048^2 < 2^31)
            sat[1:, 1:] = np.cumsum(
                np.cumsum(canvas, axis=0, dtype=np.int64), axis=1
            ).astype(np.int32)
            cls._sat_cache[cache_key] = sat
        return cls._sat_cache[cache_key]


def random_pattern_mask(
    key: jax.Array,
    shape: Sequence[int],
    max_size: int = 10000,
    resolution: float = 0.06,
    density: float = 0.25,
    density_std: float = 0.05,
    canvas_size: int = 2048,
    canvas_seed: int = 0,
    update_freq: Optional[float] = None,
    num_canvases: int = 4,
) -> jnp.ndarray:
    """Random crops of a thresholded bicubic-noise canvas with density
    rejection (reference RandomPatternMaskGenerator:177-232).

    ``update_freq`` (reference masking.py:227-228): the reference REGENERATES
    its canvas after ``update_freq * max_size**2`` cropped points — a
    schedule over a hidden draw counter. A pure ``(key, shape)`` function has
    no draw counter, so regeneration-on-schedule is realized as random
    selection from a pool of ``num_canvases`` iid pre-built canvases (one
    key-derived index per call; canvases are iid, so each crop's marginal
    distribution is identical to the reference's — only the pairing of
    "which draws share a canvas" differs, and the reference's own pairing is
    an arbitrary artifact of draw order). The pool's canvases and their
    summed-area tables embed as program constants (~21 MB each at the
    default 2048 canvas), so keep ``num_canvases`` modest. ``update_freq``'s
    VALUE is accepted for signature parity but only its presence matters
    here; ``None`` (default) keeps the single fixed canvas."""
    del max_size  # canvas_size plays its role on device
    b, h, w = _flatten_image_shape(shape)
    if update_freq is not None and num_canvases > 1:
        k_canvas, key = jax.random.split(key)
        canvases = np.stack([
            _PatternCanvas.get(canvas_size, resolution, density, canvas_seed + i)
            for i in range(num_canvases)
        ])
        sats = np.stack([
            _PatternCanvas.get_sat(canvas_size, resolution, density, canvas_seed + i)
            for i in range(num_canvases)
        ])
        cidx = jax.random.randint(k_canvas, (), 0, num_canvases)
        canvas = jax.lax.dynamic_index_in_dim(
            jnp.asarray(canvases), cidx, keepdims=False
        )
        sat = jax.lax.dynamic_index_in_dim(
            jnp.asarray(sats), cidx, keepdims=False
        )
    else:
        canvas = _PatternCanvas.get(canvas_size, resolution, density, canvas_seed)
        sat = _PatternCanvas.get_sat(canvas_size, resolution, density, canvas_seed)
    k = _REJECTION_CANDIDATES
    kx, ky = jax.random.split(key)
    xs = jax.random.randint(kx, (b, k), 0, canvas_size - w + 1)
    ys = jax.random.randint(ky, (b, k), 0, canvas_size - h + 1)

    # Candidate densities from the summed-area table: four gathered corners
    # per candidate instead of a [B, K, H, W] window gather — the selection
    # is identical (the integer one-count is exact in both formulations; the
    # f32 division matches the crop-mean bit-for-bit at power-of-two crop
    # sizes and to 1 ulp otherwise). Only the ONE winning crop per batch
    # element is then actually sliced.
    sat = jnp.asarray(sat)  # embeds as a program constant, like the canvas
    count = (
        sat[ys + h, xs + w] - sat[ys, xs + w] - sat[ys + h, xs] + sat[ys, xs]
    )
    coverage = count.astype(jnp.float32) / np.float32(h * w)
    valid = jnp.abs(coverage - density) < density_std
    # first valid candidate, else the candidate closest to target density
    first = jnp.argmax(valid, axis=-1)
    closest = jnp.argmin(jnp.abs(coverage - density), axis=-1)
    idx = jnp.where(jnp.any(valid, axis=-1), first, closest)

    x_sel = jnp.take_along_axis(xs, idx[:, None], axis=1)[:, 0]
    y_sel = jnp.take_along_axis(ys, idx[:, None], axis=1)[:, 0]

    def crop(x, y):
        return jax.lax.dynamic_slice(canvas, (y, x), (h, w))

    picked = jax.vmap(crop)(x_sel, y_sel).astype(jnp.float32)  # [B,H,W]
    return (1.0 - picked)[..., None]


# ---------------------------------------------------------------------------
# Mixtures
# ---------------------------------------------------------------------------


def mixture_mask(
    key: jax.Array,
    shape: Sequence[int],
    generators: Sequence[MaskFn],
    weights: Sequence[float],
    batch_level: bool = False,
) -> jnp.ndarray:
    """Mixture over component generators (reference MixtureMaskGenerator:24).

    ``batch_level=False`` (the default, and what every shipped reference
    config uses): every batch element independently picks a component.
    ``batch_level=True`` (reference masking.py:39-42): ONE component index is
    drawn for the whole batch. Either way all components are evaluated
    batched and selected by index — cheap (masks are tiny), fully on-device,
    and shape-static under jit."""
    b = shape[0]
    w = np.asarray(weights, np.float32)
    w = w / w.sum()
    k_choice, *k_gens = jax.random.split(key, len(generators) + 1)
    masks = jnp.stack(
        [gen(k, shape) for gen, k in zip(generators, k_gens)], axis=1
    )
    if batch_level:
        choice = jax.random.choice(
            k_choice, len(generators), (), p=jnp.asarray(w)
        )
        return jnp.take(masks, choice, axis=1)
    choice = jax.random.choice(
        k_choice, len(generators), (b,), p=jnp.asarray(w)
    )
    sel = choice.reshape((b,) + (1,) * (masks.ndim - 2))
    return jnp.take_along_axis(masks, sel[:, None], axis=1)[:, 0]


def _flatten_mixture(generators, weights):
    """Flattens nested (generators, weights) specs into one categorical."""
    flat_g, flat_w = [], []
    total = float(sum(weights))
    for g, w in zip(generators, weights):
        if isinstance(g, tuple):  # nested mixture: (generators, weights)
            sub_g, sub_w = _flatten_mixture(*g)
            for sg, sw in zip(sub_g, sub_w):
                flat_g.append(sg)
                flat_w.append(w / total * sw)
        else:
            flat_g.append(g)
            flat_w.append(w / total)
    return flat_g, flat_w


def _mk(fn, **kwargs) -> MaskFn:
    return functools.partial(fn, **kwargs)


def _mnist_like_spec(dim: int, rect_kwargs=None, bern_p: float = 0.5):
    half = dim // 2
    rect_kwargs = rect_kwargs or {}
    gens = [
        _mk(image_bernoulli_mask, p=bern_p),
        _mk(fixed_rectangle_mask, y1=0, x1=0, y2=dim, x2=half),
        _mk(fixed_rectangle_mask, y1=0, x1=0, y2=half, x2=dim),
        _mk(fixed_rectangle_mask, y1=0, x1=half, y2=dim, x2=dim),
        _mk(fixed_rectangle_mask, y1=half, x1=0, y2=dim, x2=dim),
        _mk(square_mask, size=half),
        _mk(rectangle_mask, **rect_kwargs),
    ]
    weights = [2, 1, 1, 1, 1, 2, 2]
    return gens, weights


def mnist_mask_spec(dim: int = 28):
    """Reference MNISTMaskGenerator (masking.py:235)."""
    return _mnist_like_spec(dim)


def omniglot_mask_spec():
    """Reference OmniglotMaskGenerator (masking.py:252)."""
    return _mnist_like_spec(28, rect_kwargs=dict(min_prop=0.1, max_prop=0.6))


def cifar10_mask_spec():
    """Reference Cifar10MaskGenerator (masking.py:270)."""
    return _mnist_like_spec(
        32, rect_kwargs=dict(min_prop=0.1, max_prop=0.5), bern_p=0.3
    )


def gcf_mask_spec():
    """Reference GCFMaskGenerator (masking.py:288)."""
    rects = [
        (26, 17, 58, 36),
        (26, 29, 58, 48),
        (26, 15, 37, 50),
        (26, 15, 37, 34),
        (26, 31, 37, 50),
        (43, 20, 62, 44),
    ]
    gens = [
        _mk(fixed_rectangle_mask, y1=y1, x1=x1, y2=y2, x2=x2)
        for (y1, x1, y2, x2) in rects
    ]
    return gens, [1] * 6


def siidgm_mask_spec():
    """Reference SIIDGMMaskGenerator (masking.py:302)."""
    gens = [
        _mk(random_pattern_mask, resolution=0.06),
        _mk(image_bernoulli_mask, p=0.2),
        _mk(fixed_rectangle_mask, y1=16, x1=16, y2=48, x2=48),
        _mk(fixed_rectangle_mask, y1=0, x1=0, y2=64, x2=32),
        _mk(fixed_rectangle_mask, y1=0, x1=0, y2=32, x2=64),
        _mk(fixed_rectangle_mask, y1=0, x1=32, y2=64, x2=64),
        _mk(fixed_rectangle_mask, y1=32, x1=0, y2=64, x2=64),
    ]
    return gens, [2, 2, 2, 1, 1, 1, 1]


def celeb_a_mask_spec():
    """Reference CelebAMaskGenerator (masking.py:317): nested mixture of
    SIIDGM + GCF + Rectangle with weights [1, 1, 2], flattened here into a
    single categorical (identical distribution)."""
    gens = [siidgm_mask_spec(), gcf_mask_spec(), _mk(rectangle_mask)]
    return _flatten_mixture(gens, [1, 1, 2])


_REGISTRY = {
    "BernoulliMaskGenerator": lambda **kw: _mk(bernoulli_mask, **kw),
    "UniformMaskGenerator": lambda **kw: _mk(uniform_mask, **kw),
    "ImageBernoulliMaskGenerator": lambda **kw: _mk(image_bernoulli_mask, **kw),
    "RectangleMaskGenerator": lambda **kw: _mk(rectangle_mask, **kw),
    "MNISTMaskGenerator": lambda **kw: _mk(
        mixture_mask, generators=mnist_mask_spec(**kw)[0],
        weights=mnist_mask_spec(**kw)[1],
    ),
    "OmniglotMaskGenerator": lambda **kw: _mk(
        mixture_mask, generators=omniglot_mask_spec()[0],
        weights=omniglot_mask_spec()[1],
    ),
    "Cifar10MaskGenerator": lambda **kw: _mk(
        mixture_mask, generators=cifar10_mask_spec()[0],
        weights=cifar10_mask_spec()[1],
    ),
    "CelebAMaskGenerator": lambda **kw: _mk(
        mixture_mask, generators=celeb_a_mask_spec()[0],
        weights=celeb_a_mask_spec()[1],
    ),
}


def get_mask_generator(name: str, **kwargs) -> MaskFn:
    """Returns a pure ``(key, shape) -> mask`` function by reference name
    (mirrors reference ``get_mask_generator``, masking.py:328; also exposes the
    image mixtures for completeness)."""
    # `bounds` may arrive as a list from JSON round trips.
    if "bounds" in kwargs and kwargs["bounds"] is not None:
        kwargs["bounds"] = tuple(kwargs["bounds"])
    return _REGISTRY[name](**kwargs)


def add_mask(
    batch: dict, key: jax.Array, mask_fn: MaskFn, data_key: Optional[str] = None
) -> dict:
    """Adds a ``"mask"`` entry to a batch dict, on device, inside jit.

    Image masks are broadcast as [B, H, W, 1] (matching reference
    ``get_add_mask_fn``, masking.py:338-350). This is intended to be called
    from within the jitted train/eval step so the mask sampling fuses with the
    model's masking prologue.
    """
    if data_key is None:
        data_key = "image" if "image" in batch else "features"
    x = batch[data_key]
    mask = mask_fn(key, x.shape)
    if data_key == "image":
        mask = mask.reshape((*x.shape[:-1], 1))
    else:
        mask = mask.reshape(x.shape)
    out = dict(batch)
    out["mask"] = mask
    return out
