"""Real datasets from on-disk sources (no network egress required).

The reference's quality story rests on real data (reference README.md:37-48),
but this environment has no egress, so ``prepare_uci.py``/``prepare_images.py``
cannot download gas/power/hepmass/miniboone/bsds/MNIST/CelebA. scikit-learn,
however, SHIPS real datasets inside its wheel — genuinely measured data, not
synthetic stand-ins. This script converts them into the framework's local-drop
contract (``data/<dataset>/<split>.npz``, see data/sources.py) so every
pipeline stage can be exercised end-to-end on real data and produce real
quality metrics (NRMSE / AC-LL / clustering accuracy / PSNR / PRD):

- ``digits``      1,797 real 8x8 handwritten-digit images (uint8 [0,255],
                  upscaled from the original 17 gray levels) + labels.
- ``digits16``    the same images bilinear-resized to 16x16 (the reference
                  applies the identical treatment to MNIST for its mnist16
                  configs, reference utils.py:79-86) — drives the full
                  VQ-VAE -> PM-VQVAE -> PSNR/PRD flagship pipeline.
- ``digits_flat`` the images flattened to 64-d features in [0,1] (the
                  reference's mnist16_flat treatment, utils.py:88-96) —
                  drives the UCI PM-VAE path and MLP VaDE clustering.
- ``wine``        178 x 13 real UCI wine chemical measurements, standardized.
- ``breast_cancer`` 569 x 30 real UCI diagnostic measurements, standardized.

Splits are a deterministic 80/10/10 shuffle (seed 0). A PROVENANCE.json with
per-file SHA-256 checksums is written alongside, mirroring the
checksum-verified drop contract of prepare_uci.py.

Usage:  python datasets/prepare_local.py [--data_dir data]
"""
import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from posterior_matching_tpu.data.datasets import _resize_batch  # noqa: E402


def _split(n: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_test = max(n // 10, 1)
    n_val = max(n // 10, 1)
    return {
        "train": perm[: n - n_val - n_test],
        "val": perm[n - n_val - n_test : n - n_test],
        "test": perm[n - n_test :],
    }


def _write(data_dir, dataset, split, arrays, manifest):
    d = os.path.join(data_dir, dataset)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{split}.npz")
    np.savez_compressed(path, **arrays)
    with open(path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    sizes = {k: list(v.shape) for k, v in arrays.items()}
    manifest[f"{dataset}/{split}"] = {"sha256": digest, "shapes": sizes}
    print(f"wrote {path}: " + ", ".join(f"{k}{v}" for k, v in sizes.items()))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", default="data")
    args = parser.parse_args()

    from sklearn.datasets import load_breast_cancer, load_digits, load_wine

    manifest = {}

    # --- digits (images + labels + flattened features) ---
    dig = load_digits()
    # The original data has 17 gray levels (0..16); scale to the uint8 [0,255]
    # range the image pipeline expects (it rescales by /255 on device).
    images = np.round(dig.images * (255.0 / 16.0)).astype(np.uint8)[..., None]
    labels = dig.target.astype(np.int64)
    splits = _split(len(images))
    img16 = np.clip(
        np.round(_resize_batch(images.astype(np.float32), (16, 16))), 0, 255
    ).astype(np.uint8)
    flat = (dig.data.astype(np.float32) / 16.0).reshape(len(images), -1)
    for split, idx in splits.items():
        _write(args.data_dir, "digits", split,
               {"image": images[idx], "label": labels[idx]}, manifest)
        _write(args.data_dir, "digits16", split,
               {"image": img16[idx], "label": labels[idx]}, manifest)
        _write(args.data_dir, "digits_flat", split,
               {"features": flat[idx], "label": labels[idx]}, manifest)

    # --- UCI-style tables (standardized: the columns span wildly different
    # scales, unlike the reference's pre-normalized UCI drops) ---
    for name, loader in (
        ("wine", load_wine),
        ("breast_cancer", load_breast_cancer),
    ):
        ds = loader()
        x = ds.data.astype(np.float32)
        labels = ds.target.astype(np.int64)
        splits = _split(len(x))
        mu = x[splits["train"]].mean(0)
        sd = x[splits["train"]].std(0) + 1e-8
        x = (x - mu) / sd
        for split, idx in splits.items():
            _write(args.data_dir, name, split,
                   {"features": x[idx], "label": labels[idx]}, manifest)

    prov_path = os.path.join(args.data_dir, "PROVENANCE.json")
    with open(prov_path, "w") as f:
        json.dump(
            {
                "source": "scikit-learn bundled datasets (real measured data "
                          "shipped in the wheel; no network used)",
                "split": "deterministic 80/10/10 shuffle, seed 0",
                "files": manifest,
            },
            f, indent=1,
        )
    print(f"wrote {prov_path} ({len(manifest)} files)")


if __name__ == "__main__":
    main()
