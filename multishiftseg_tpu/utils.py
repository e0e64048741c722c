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


_ALLOCATOR_TUNED = False


def tune_host_allocator() -> bool:
    """Keep large freed buffers in the glibc heap instead of returning them to
    the kernel (M_MMAP_THRESHOLD / M_TRIM_THRESHOLD -> 1 GiB).

    The data pipeline allocates tens-of-MB numpy batches per step; with glibc's
    default dynamic mmap threshold each one is a fresh mmap whose pages fault
    on first touch and unmap on free. On virtualized hosts those faults are
    erratically slow (measured here: an identical 500 MB temporary costing
    42 ms or 3,258 ms run-to-run; Loader throughput 2.9 -> 10.1 samples/s
    after tuning — PERF.md host-pipeline section). Linux/glibc only; no-op
    elsewhere. Idempotent."""
    global _ALLOCATOR_TUNED
    if _ALLOCATOR_TUNED:
        return True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = (libc.mallopt(-3, 1 << 30) == 1   # M_MMAP_THRESHOLD
              and libc.mallopt(-1, 1 << 30) == 1)  # M_TRIM_THRESHOLD
        _ALLOCATOR_TUNED = bool(ok)
        return _ALLOCATOR_TUNED
    except Exception:  # noqa: BLE001 — non-glibc / non-Linux: keep defaults
        return False


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (idempotent, best-effort).

    The full-scale train/eval programs take minutes to compile over the
    tunneled device transport; caching makes repeat runs of the trainers,
    the test runner, and bench.py compile-free. Default location:
    ``<repo>/.jax_cache`` (next to this package), overridable via
    ``MSS_JAX_CACHE_DIR`` (empty string disables)."""
    import jax

    env = os.environ.get("MSS_JAX_CACHE_DIR")
    if env == "":
        return
    path = path or env or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    try:
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass
