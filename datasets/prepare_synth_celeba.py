"""Materialize the deterministic synthetic CelebA stand-in as local drops.

The real CelebA files (reference README.md:43-48, TFDS `celeb_a`) are
egress-blocked in this environment, so the flagship-shape quality A/B
(ours vs the reference implementation at the `pm_vqvae_celeb_a` config)
runs on the framework's deterministic synthetic stand-in
(`posterior_matching_tpu/data/sources.py::_synthetic_image`, raw CelebA
shape 218x178x3).  Writing it through the checksum-verified local-drop
contract guarantees BOTH implementations read the identical bytes —
`load_arrays` prefers `data/celeb_a/<split>.npz` over the in-process
generator, and the reference-quality harness
(`datasets/reference_quality_images.py`) reads the same files.

Usage:
    python datasets/prepare_synth_celeba.py [--data_dir data]
"""
import argparse
import hashlib
import json
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from posterior_matching_tpu.data.sources import _synthetic_image  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", default="data")
    args = parser.parse_args()

    d = os.path.join(args.data_dir, "celeb_a")
    os.makedirs(d, exist_ok=True)
    manifest = {}
    for split in ("train", "validation", "test"):
        arrays = _synthetic_image("celeb_a", split)
        path = os.path.join(d, f"{split}.npz")
        np.savez_compressed(path, **arrays)
        with open(path, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()
        manifest[f"celeb_a/{split}"] = {
            "sha256": digest,
            "shapes": {k: list(v.shape) for k, v in arrays.items()},
        }
        print(f"wrote {path}: "
              + ", ".join(f"{k}{list(v.shape)}" for k, v in arrays.items()))

    prov_path = os.path.join(args.data_dir, "PROVENANCE_celeb_a.json")
    with open(prov_path, "w") as f:
        json.dump(
            {
                "source": "SYNTHETIC stand-in (deterministic label-dependent "
                          "blobs, sources.py::_synthetic_image; real CelebA "
                          "is egress-blocked). NOT paper-comparable — used "
                          "for same-data implementation A/Bs only.",
                "files": manifest,
            },
            f, indent=1,
        )
    print(f"wrote {prov_path}")


if __name__ == "__main__":
    main()
