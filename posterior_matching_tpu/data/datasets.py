"""Input pipeline: numpy batcher + reference-compatible dataset transforms.

Replaces the tf.data pipeline of reference ``utils.py:36-121``. Two deliberate
TPU-first differences:

- **masks are not added here.** Mask generation is a pure jax function fused
  into the jitted train/eval step (see :func:`make_prologue`), eliminating the
  reference's per-batch host ``tf.py_function`` callback
  (reference masking.py:342).
- **training noise is also applied on device** in the same prologue
  (reference utils.py:108-116 adds it in tf.data).

Everything else mirrors the reference transform order: shuffle (train only) ->
batch (drop remainder) -> /255 rescale for images -> celeb_a center-crop to
128x128 and resize to 64x64 -> mnist16 resize -> mnist16_flat flatten.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterator, Mapping, Optional, Tuple

import jax
import numpy as np
from PIL import Image

from posterior_matching_tpu import masking
from posterior_matching_tpu import native
from posterior_matching_tpu.data.sources import load_arrays


class ArrayDataset:
    """A shuffling, batching iterator over in-memory arrays.

    Iterating yields dict batches (one epoch). ``transform`` runs per batch on
    host numpy (cheap casts only — heavy work belongs on device)."""

    def __init__(
        self,
        data: Dict[str, np.ndarray],
        batch_size: int,
        shuffle: bool = False,
        drop_remainder: bool = True,
        seed: Optional[int] = None,
        transform: Optional[Callable[[Dict], Dict]] = None,
    ):
        n = len(next(iter(data.values())))
        for k, v in data.items():
            assert len(v) == n, f"ragged dataset field {k}"
        self._data = data
        self._n = n
        self._batch_size = batch_size
        self._shuffle = shuffle
        self._drop_remainder = drop_remainder
        self._rng = np.random.RandomState(seed)
        self._transform = transform
        self._pending_skip = 0  # batches to skip (index-only) next epoch

    @property
    def batch_size(self) -> int:
        return self._batch_size

    @property
    def num_examples(self) -> int:
        return self._n

    def cardinality(self) -> int:
        if self._drop_remainder:
            return self._n // self._batch_size
        return -(-self._n // self._batch_size)

    @property
    def element_spec(self) -> Dict[str, Tuple]:
        out = {}
        for k, v in self._data.items():
            sample = {k: v[:1] for k, v in self._data.items()}
            if self._transform:
                sample = self._transform(sample)
            out = {
                k2: (tuple([self._batch_size, *v2.shape[1:]]), v2.dtype)
                for k2, v2 in sample.items()
            }
            break
        return out

    def rebatch(self, batch_size: int) -> "ArrayDataset":
        return ArrayDataset(
            self._data,
            batch_size,
            shuffle=self._shuffle,
            drop_remainder=self._drop_remainder,
            seed=self._rng.randint(2**31),
            transform=self._transform,
        )

    def take(self, n: int) -> "ArrayDataset":
        return ArrayDataset(
            {k: v[:n] for k, v in self._data.items()},
            self._batch_size,
            shuffle=self._shuffle,
            drop_remainder=self._drop_remainder,
            seed=self._rng.randint(2**31),
            transform=self._transform,
        )

    def _gather(self, sel: np.ndarray) -> Dict[str, np.ndarray]:
        """Assembles one batch. Uses the native multithreaded gather kernels
        (posterior_matching_tpu/native) when available, including the fused
        uint8 -> float32 rescale for image fields; falls back to numpy."""
        fused = getattr(self._transform, "u8_scale_fields", {})
        batch = {}
        prescaled = set()
        use_native = native.available()
        for k, v in self._data.items():
            if (
                use_native
                and k in fused
                and v.dtype == np.uint8
                and v.flags.c_contiguous
            ):
                batch[k] = native.gather_u8_to_f32(v, sel, fused[k])
                prescaled.add(k)
            elif use_native and v.flags.c_contiguous and v.ndim >= 1:
                batch[k] = native.gather_rows(v, sel)
            else:
                batch[k] = v[sel]
        if prescaled:
            batch["_prescaled"] = prescaled
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = np.arange(self._n)
        if self._shuffle:
            self._rng.shuffle(idx)
        stop = (
            self._n - self._batch_size + 1 if self._drop_remainder else self._n
        )
        # Constant-time resume (skip_stream): skipped batches cost index
        # arithmetic only — no gather, no transform.
        skip, self._pending_skip = self._pending_skip, 0
        for start in range(
            skip * self._batch_size, max(stop, 0), self._batch_size
        ):
            sel = idx[start : start + self._batch_size]
            batch = self._gather(sel)
            if self._transform:
                batch = self._transform(batch)
            batch.pop("_prescaled", None)
            yield batch

    def spec_batch(self) -> Dict[str, np.ndarray]:
        """A correctly-shaped batch (the first ``batch_size`` rows, unshuffled)
        WITHOUT touching the shuffle RNG — for shape/dtype-only consumers like
        ``Trainer.init`` on the resume path."""
        sel = np.arange(min(self._batch_size, self._n))
        batch = self._gather(sel)
        if self._transform:
            batch = self._transform(batch)
        batch.pop("_prescaled", None)
        return batch

    def skip_stream(self, n: int) -> None:
        """Advances the batch stream so the NEXT batch drawn (iterating this
        dataset in repeated epochs) is stream position ``n`` — in
        O(n / epoch_len) permutation time and ZERO data gathers, instead of
        the O(n) gather+transform of replaying batches.

        Equivalent RNG semantics to a real replay: each burned epoch consumes
        exactly one ``shuffle`` call, and the epoch containing position ``n``
        shuffles when its iteration starts (the in-epoch offset is skipped by
        index arithmetic inside ``__iter__``).
        """
        c = self.cardinality()
        epochs, pos = divmod(int(n), c)
        if self._shuffle:
            idx = np.arange(self._n)
            for _ in range(epochs):
                self._rng.shuffle(idx)
        self._pending_skip = pos

    def as_numpy_iterator(self):
        return iter(self)

    def to_device_resident(self) -> "DeviceDataset":
        """Returns a :class:`DeviceDataset` over this dataset, so training
        batches are gathered on device instead of assembled on host. Pair
        with ``Trainer(steps_per_call=K)`` to remove the host from the input
        path entirely.

        When the host transform is a pure uint8->float rescale (the common
        image case), the ORIGINAL uint8 arrays are kept and the rescale moves
        into the DeviceDataset's on-device transform — 4x less HBM than
        materializing float32. Otherwise the transform is materialized once
        on host (deterministic order)."""
        fused = getattr(self._transform, "u8_scale_fields", None)
        if fused and self._is_pure_rescale(fused):
            scales = dict(fused)

            def device_transform(batch):
                import jax.numpy as jnp

                out = {k: v for k, v in batch.items() if k != "id"}
                for k, s in scales.items():
                    out[k] = out[k].astype(jnp.float32) * s
                return out

            data = {k: v for k, v in self._data.items() if k != "id"}
            return DeviceDataset(
                data, self._batch_size, transform=device_transform
            )

        full = ArrayDataset(
            self._data,
            batch_size=self._batch_size,
            shuffle=False,
            drop_remainder=False,
            transform=self._transform,
        )
        batches = list(iter(full))
        data = {
            k: np.concatenate([b[k] for b in batches])
            for k in batches[0]
        }
        return DeviceDataset(data, self._batch_size)

    def _is_pure_rescale(self, fused: Dict[str, float]) -> bool:
        """True when the host transform is exactly `uint8 fields * scale`
        (no resizes, renames, or dropped fields) on this dataset's arrays."""
        sample = {k: v[:2] for k, v in self._data.items()}
        got = self._transform(dict(sample))
        want = {k: v for k, v in sample.items() if k != "id"}
        for k, s in fused.items():
            if k not in want or want[k].dtype != np.uint8:
                return False
            want[k] = want[k].astype(np.float32) * s
        if set(got) != set(want):
            return False
        return all(
            got[k].shape == want[k].shape
            and got[k].dtype == want[k].dtype
            and np.allclose(got[k], want[k])
            for k in want
        )


class DeviceDataset:
    """Training data resident in device HBM (replicated per chip).

    Hand this to :class:`posterior_matching_tpu.train.Trainer` instead of an
    :class:`ArrayDataset` and batches are gathered ON DEVICE inside the
    (scan-fused) jitted train step: uniform-with-replacement index sampling
    keyed by the step counter, `jnp.take`, optional on-device ``transform``
    (e.g. uint8→float rescale), then the usual mask/noise prologue. The host
    input pipeline disappears entirely — no per-step gather, transfer, or
    dispatch. The reference cannot express this at all: its masks are
    generated by a host callback per batch (reference masking.py:342).

    Cost: one full copy of the (pre-transform) dataset per chip; store uint8
    and rescale in ``transform`` to keep it small. Sampling-with-replacement
    replaces shuffled epochs (equivalent in expectation for SGD; keyed by
    step, so mid-run resume needs no stream replay).
    """

    def __init__(
        self,
        data: Dict[str, np.ndarray],
        batch_size: int,
        transform: Optional[Callable[[Dict], Dict]] = None,
    ):
        n = len(next(iter(data.values())))
        for k, v in data.items():
            assert len(v) == n, f"ragged dataset field {k}"
        self.data = data
        self.batch_size = batch_size
        self.num_examples = n
        self.transform = transform

    def example_batch(self) -> Dict[str, np.ndarray]:
        """A host-side sample batch (for init/compile shapes)."""
        batch = {
            k: np.asarray(v[: self.batch_size]) for k, v in self.data.items()
        }
        if self.transform is not None:
            import jax

            batch = jax.device_get(jax.jit(self.transform)(batch))
        return batch

    @property
    def element_spec(self) -> Dict[str, Tuple]:
        """Post-transform batch spec, same contract as ArrayDataset's."""
        eb = self.example_batch()
        return {
            k: (tuple([self.batch_size, *v.shape[1:]]), v.dtype)
            for k, v in eb.items()
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Host-side iteration in deterministic order (one epoch, remainder
        kept) — lets host consumers (e.g. the VaDE GMM-fitting phase) treat a
        DeviceDataset like an ArrayDataset."""
        import jax

        tfn = jax.jit(self.transform) if self.transform is not None else None
        for start in range(0, self.num_examples, self.batch_size):
            batch = {
                k: np.asarray(v[start : start + self.batch_size])
                for k, v in self.data.items()
            }
            if tfn is not None:
                batch = jax.device_get(tfn(batch))
            yield batch

    def as_numpy_iterator(self):
        return iter(self)


def _resize_batch(images: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize on host (PIL), matching tf.image.resize defaults
    closely enough for training pipelines."""
    h, w = size
    out = np.zeros((len(images), h, w, images.shape[-1]), np.float32)
    for i, img in enumerate(images):
        if img.shape[-1] == 1:
            pil = Image.fromarray(img[..., 0].astype(np.float32), mode="F")
            out[i, ..., 0] = np.asarray(pil.resize((w, h), Image.BILINEAR))
        else:
            for c in range(img.shape[-1]):
                pil = Image.fromarray(img[..., c].astype(np.float32), mode="F")
                out[i, ..., c] = np.asarray(pil.resize((w, h), Image.BILINEAR))
    return out


def _prepare_image_arrays(
    dataset: str, arrays: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """One-time spatial transforms (celeb_a crop/resize, reference
    utils.py:68-77), applied on uint8 arrays at load."""
    if dataset == "celeb_a":
        img = arrays["image"][:, 45:-45, 25:-25, :].astype(np.float32)
        img = _resize_batch(img, (64, 64))
        return {"image": img.astype(np.float32)}
    return arrays


def _make_batch_transform(
    dataset: str, normalize_images: bool
) -> Callable[[Dict], Dict]:
    def transform(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        out = dict(batch)
        out.pop("id", None)
        prescaled = out.get("_prescaled", ())
        if "image" in out:
            if "image" in prescaled:
                img = out["image"]  # fused native gather already rescaled
            else:
                img = out["image"].astype(np.float32)
                if normalize_images:
                    img = img / 255.0
            if "mnist16" in dataset:
                img = _resize_batch(img, (16, 16))
            out["image"] = img
        if dataset == "mnist16_flat" and "image" in out:
            img = out.pop("image")
            out["features"] = img.reshape(len(img), -1)
        return out

    if normalize_images:
        # advertise the fused uint8 gather+rescale path to ArrayDataset
        transform.u8_scale_fields = {"image": 1.0 / 255.0}
    return transform


def load_datasets(
    config: Mapping, normalize_images: bool = True
) -> Tuple[ArrayDataset, ArrayDataset]:
    """Reference-compatible ``load_datasets`` (reference utils.py:36-121),
    minus mask/noise injection (handled on device by :func:`make_prologue`)."""
    dataset = config["dataset"]
    base = "mnist" if "mnist" in dataset else dataset
    train_arrays = load_arrays(base, config.get("train_split", "train"))
    val_arrays = load_arrays(base, config.get("validation_split", "validation"))

    train_arrays = _prepare_image_arrays(dataset, train_arrays)
    val_arrays = _prepare_image_arrays(dataset, val_arrays)

    transform = _make_batch_transform(dataset, normalize_images)

    train = ArrayDataset(
        train_arrays,
        config["train_batch_size"],
        shuffle=True,
        drop_remainder=True,
        seed=config.get("shuffle_seed"),
        transform=transform,
    )
    val = ArrayDataset(
        val_arrays,
        config["val_batch_size"],
        shuffle=False,
        drop_remainder=True,
        transform=transform,
    )
    return train, val


def load_eval_dataset(
    dataset: str,
    batch_size: int,
    num_instances: Optional[int] = None,
    split: str = "test",
    normalize_images: bool = True,
    drop_remainder: bool = True,
) -> ArrayDataset:
    """Test-split loader used by the eval scripts (reference
    eval_pm_vae_uci.py:46-57, eval_pm_vqvae.py:62-99)."""
    base = "mnist" if "mnist" in dataset else dataset
    arrays = load_arrays(base, split)
    if num_instances is not None:
        arrays = {k: v[:num_instances] for k, v in arrays.items()}
    arrays = _prepare_image_arrays(dataset, arrays)
    return ArrayDataset(
        arrays,
        batch_size,
        shuffle=False,
        drop_remainder=drop_remainder,
        transform=_make_batch_transform(dataset, normalize_images),
    )


def make_prologue(config: Mapping) -> Optional[Callable]:
    """Builds the on-device batch prologue from a data config: mask generation
    (+ optional gaussian training noise). Returns a pure jax fn
    ``(batch, key) -> batch`` for Trainer's ``prologue_fn`` — it is traced into
    the train step, so mask sampling fuses with the model's masking prologue.
    """
    mask_fn = None
    if "mask_generator" in config:
        kwargs = dict(config.get("mask_generator_kwargs", {}) or {})
        mask_fn = masking.get_mask_generator(config["mask_generator"], **kwargs)
    noise_std = config.get("training_noise")

    if mask_fn is None and noise_std is None:
        return None

    def prologue(batch, key):
        import jax.numpy as jnp

        k_mask, k_noise = jax.random.split(key)
        out = dict(batch)
        if noise_std is not None and "features" in out:
            out["features"] = out["features"] + noise_std * jax.random.normal(
                k_noise, out["features"].shape, out["features"].dtype
            )
        if mask_fn is not None:
            out = masking.add_mask(out, k_mask, mask_fn)
        return out

    return prologue


def make_val_prologue(config: Mapping) -> Optional[Callable]:
    """Same as :func:`make_prologue` but without training noise (the
    reference adds noise only to the train split, utils.py:108-116)."""
    cfg = dict(config)
    cfg.pop("training_noise", None)
    return make_prologue(cfg)
