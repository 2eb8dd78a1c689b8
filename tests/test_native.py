"""Native host-kernel tests (C++ batch assembly via ctypes)."""
import numpy as np
import pytest

from posterior_matching_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain available"
)


def test_gather_rows_matches_numpy():
    rng = np.random.RandomState(0)
    src = rng.randint(0, 255, (100, 7, 5, 3), dtype=np.uint8)
    idx = rng.permutation(100)[:32]
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_gather_rows_float64():
    rng = np.random.RandomState(1)
    src = rng.randn(50, 13)
    idx = rng.randint(0, 50, size=20)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_gather_u8_to_f32_fused():
    rng = np.random.RandomState(2)
    src = rng.randint(0, 255, (64, 28, 28, 1), dtype=np.uint8)
    idx = rng.permutation(64)
    got = native.gather_u8_to_f32(src, idx, 1.0 / 255.0)
    want = src[idx].astype(np.float32) / 255.0
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gather_f32():
    rng = np.random.RandomState(3)
    src = rng.randn(64, 16).astype(np.float32)
    idx = rng.randint(0, 64, size=128)  # repeats allowed
    np.testing.assert_array_equal(native.gather_f32(src, idx), src[idx])


def test_dataset_uses_native_path():
    """ArrayDataset batches must be identical with and without the native
    kernels (same shuffle indices)."""
    from posterior_matching_tpu.data.datasets import (
        ArrayDataset,
        _make_batch_transform,
    )

    rng = np.random.RandomState(4)
    data = {
        "image": rng.randint(0, 255, (40, 8, 8, 1), dtype=np.uint8),
        "label": rng.randint(0, 10, size=40),
    }
    transform = _make_batch_transform("mnist", normalize_images=True)
    ds = ArrayDataset(data, batch_size=8, shuffle=False, transform=transform)
    batch = next(iter(ds))
    want = data["image"][:8].astype(np.float32) / 255.0
    np.testing.assert_allclose(batch["image"], want, rtol=1e-6)
    np.testing.assert_array_equal(batch["label"], data["label"][:8])
    assert "_prescaled" not in batch
