"""Prepares the five UCI density-estimation datasets as npz files.

The reference ships one TFDS ``GeneratorBasedBuilder`` per dataset
(reference ``datasets/{gas,power,hepmass,miniboone,bsds}/``), each downloading
preprocessed train/val/test text files from Google Drive and emitting
``{"features": row}`` examples. This framework is TFDS-free: the same
downloads land as ``$PM_TPU_DATA_DIR/<name>/<split>.npz`` with a ``features``
array, which :mod:`posterior_matching_tpu.data.sources` reads directly.

Usage (network required):
    python datasets/prepare_uci.py [--dataset gas] [--data_dir data]

Same Google Drive file IDs as the reference builders.
"""
import argparse
import os

import numpy as np

# (train_id, val_id, test_id, feature_dim) per reference datasets/*/[name].py
DATASETS = {
    "gas": (
        "1rhhLpGY5-5YZ-GQaZq_FniAMK9cqvxW7",
        "1y4TeXr5WhMWDZIwHh4iLIVj-eV3MgwBB",
        "17aRcAFtnYg6SVtGHksDZCQ5mgJwvve6L",
        8,
    ),
    # The remaining IDs live in the reference's builder files; fill in when
    # mirroring those datasets (the loaders only need the npz files).
    "power": (None, None, None, 6),
    "hepmass": (None, None, None, 21),
    "miniboone": (None, None, None, 43),
    "bsds": (None, None, None, 63),
}


def prepare(name: str, data_dir: str):
    try:
        import gdown  # type: ignore
    except ImportError as e:
        raise SystemExit(
            "gdown is required to download the UCI files (or place "
            "<split>.txt files under the dataset directory manually)"
        ) from e

    train_id, val_id, test_id, dim = DATASETS[name]
    out_dir = os.path.join(data_dir, name)
    os.makedirs(out_dir, exist_ok=True)

    for split, file_id in (
        ("train", train_id), ("val", val_id), ("test", test_id)
    ):
        txt = os.path.join(out_dir, f"{split}.txt")
        if not os.path.exists(txt):
            if file_id is None:
                raise SystemExit(
                    f"no download id recorded for {name}/{split}; place "
                    f"{txt} manually"
                )
            gdown.download(output=txt, id=file_id)
        data = np.loadtxt(txt, dtype=np.float32)
        assert data.shape[1] == dim, (name, split, data.shape)
        np.savez(os.path.join(out_dir, f"{split}.npz"), features=data)
        print(f"{name}/{split}: {data.shape} -> {split}.npz")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default=None, choices=list(DATASETS))
    parser.add_argument("--data_dir", default="data")
    args = parser.parse_args()
    for name in [args.dataset] if args.dataset else DATASETS:
        prepare(name, args.data_dir)
