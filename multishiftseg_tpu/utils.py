"""Small utilities mirroring the reference ``lib/utils/utils.py``: seeding,
prediction colorization, checkpoint download."""

from __future__ import annotations

import os
import random
import urllib.request
from typing import Optional

import numpy as np

from .data.cityscapes import TRAIN_ID_COLORS


def random_init(seed: int = 0) -> None:
    """Seed every host-side RNG (the device side uses explicit jax PRNG keys,
    so nothing like cudnn-determinism toggles is needed)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ.setdefault("PYTHONHASHSEED", str(seed))


def map2citycolor(pred: np.ndarray) -> np.ndarray:
    """Train-id prediction map [H, W] -> RGB visualization [H, W, 3]
    (the reference's broken ``map2citycolor`` import, reimplemented)."""
    out = np.zeros(pred.shape + (3,), np.uint8)
    for tid, color in TRAIN_ID_COLORS.items():
        out[pred == tid] = color
    return out


def download_checkpoint(url: str, dest: str) -> str:
    """Fetch a checkpoint if absent (reference ``download_checkpoint`` via wget)."""
    if not os.path.exists(dest):
        os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
        urllib.request.urlretrieve(url, dest)
    return dest


def save_as_hdf5(data: np.ndarray, path: str, var_name: str = "value",
                 compression: int = 9) -> None:
    """Dump an array to HDF5 (reference ``utils.py:70-76``; unused by its entry
    points but part of the public util surface)."""
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset(var_name, data=np.asarray(data), compression="gzip",
                         compression_opts=compression)
