from posterior_matching_tpu.data.datasets import (
    ArrayDataset,
    DeviceDataset,
    load_datasets,
    load_eval_dataset,
    make_prologue,
    make_val_prologue,
)
from posterior_matching_tpu.data.sources import load_arrays

__all__ = [
    "ArrayDataset",
    "DeviceDataset",
    "load_arrays",
    "load_datasets",
    "load_eval_dataset",
    "make_prologue",
    "make_val_prologue",
]
