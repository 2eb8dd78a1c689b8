"""Image embeddings for PRD evaluation.

The reference embeds images with the TF-Hub tfgan Inception ``pool_3`` head
(reference ``posterior_matching/prd/inception.py``). That model requires a
network download, so this framework resolves the embedding function in order:

1. a locally cached TF-Hub inception (if ``tensorflow_hub`` is importable and
   the module is already on disk — set ``TFHUB_CACHE_DIR``);
2. a deterministic random-projection conv feature extractor on the
   accelerator (fixed seed): 4 strided conv layers + global pooling to 2048-d.
   Random convolutional features are a standard cheap proxy for perceptual
   embeddings; PRD comparisons remain internally consistent across models
   evaluated with the same extractor.

Both paths expose the reference's signature:
``get_inception_embeddings(images, batch_size=32, verbose=True) -> [N, 2048]``.
"""
from __future__ import annotations

import functools
import hashlib
import os
import warnings

import numpy as np

_INCEPTION_URL = "https://tfhub.dev/tensorflow/tfgan/eval/inception/1"


def _tfhub_module_cached() -> bool:
    """True iff the inception module is already on disk (no download would
    be triggered). TF-Hub caches each handle under
    ``<cache_dir>/<sha1(handle)>``, where cache_dir is ``$TFHUB_CACHE_DIR``
    when set and otherwise TF-Hub's default, ``<tempdir>/tfhub_modules`` —
    check both so an explicitly-unset env var doesn't hide a populated
    default cache."""
    import tempfile

    candidates = [
        os.environ.get("TFHUB_CACHE_DIR"),
        os.path.join(tempfile.gettempdir(), "tfhub_modules"),
    ]
    digest = hashlib.sha1(_INCEPTION_URL.encode("utf8")).hexdigest()
    for cache_dir in candidates:
        if not cache_dir:
            continue
        module_dir = os.path.join(cache_dir, digest)
        if os.path.isdir(module_dir) and os.listdir(module_dir):
            return True
    return False


@functools.lru_cache(maxsize=1)
def _try_tfhub():
    # Only load when the module is ALREADY cached — hub.load would otherwise
    # attempt a network download mid-eval.
    if not _tfhub_module_cached():
        return None
    try:
        import tensorflow_hub as hub  # type: ignore

        return hub.load(_INCEPTION_URL)
    except Exception:
        return None


@functools.lru_cache(maxsize=1)
def embedder_provenance() -> str:
    """Which embedder PRD numbers come from: ``"inception"`` (the reference's
    protocol, TF-Hub tfgan pool_3) or ``"random_conv"`` (the deterministic
    fallback — PRD values are then internally consistent but NOT comparable
    to the reference protocol or the paper). Recorded in eval outputs."""
    if _try_tfhub() is not None:
        return "inception"
    warnings.warn(
        "TF-Hub inception is not cached; PRD will use the deterministic "
        "random-conv embedder. Precision/recall values are internally "
        "consistent but NOT comparable to the reference protocol. Set "
        "TFHUB_CACHE_DIR to a directory containing the tfgan inception "
        "module to match the reference.",
        stacklevel=2,
    )
    return "random_conv"


@functools.lru_cache(maxsize=1)
def _random_conv_embedder():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(20260816)
    keys = jax.random.split(key, 5)
    dims = [(3, 32), (32, 64), (64, 128), (128, 256)]
    kernels = [
        jax.random.normal(k, (4, 4, cin, cout)) / np.sqrt(16 * cin)
        for k, (cin, cout) in zip(keys, dims)
    ]
    proj = jax.random.normal(keys[4], (256 * 2, 2048)) / np.sqrt(512)

    @jax.jit
    def embed(x):
        h = x.astype(jnp.float32) / 255.0
        for w in kernels:
            h = jax.lax.conv_general_dilated(
                h, w, window_strides=(2, 2), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = jax.nn.leaky_relu(h)
        mean = jnp.mean(h, axis=(1, 2))
        mx = jnp.max(h, axis=(1, 2))
        return jnp.concatenate([mean, mx], axis=-1) @ proj

    return embed


def get_inception_embeddings(
    images: np.ndarray, batch_size: int = 32, verbose: bool = True
) -> np.ndarray:
    """[N, H, W, C] images in [0, 1] -> [N, 2048] embeddings."""
    if images.shape[-1] == 1:
        images = np.tile(images, [1, 1, 1, 3])
    images_u8 = (np.asarray(images) * 255).astype(np.uint8)

    embedder_provenance()  # warn loudly (once) if falling back
    inception = _try_tfhub()
    out = []
    if inception is not None:
        for i in range(0, len(images_u8), batch_size):
            emb = inception(images_u8[i : i + batch_size])
            out.append(np.reshape(emb["pool_3"], [-1, 2048]))
        return np.concatenate(out, axis=0)

    embed = _random_conv_embedder()
    for i in range(0, len(images_u8), batch_size):
        out.append(np.asarray(embed(images_u8[i : i + batch_size])))
    return np.concatenate(out, axis=0)
