"""ctypes bindings for the native data-loading core (``native/dataio.cc``).

Builds the shared library on demand (g++, cached beside the source) and falls back
to PIL transparently when the toolchain or codecs are unavailable, so the pure
Python path always works.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmssdataio.so"))
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "libmssdataio.so"],
            cwd=os.path.abspath(_NATIVE_DIR),
            check=True,
            capture_output=True,
        )
        return True
    except Exception as e:  # toolchain/codec missing -> PIL fallback
        log.warning("native dataio build failed (%s); using PIL fallback", e)
        return False


_named_libs: dict = {}


def get_named_lib(so_name: str) -> Optional[ctypes.CDLL]:
    """Load (building on demand) another shared library from ``native/``
    (e.g. ``libmssmetrics.so``); None when the toolchain is unavailable."""
    with _lock:
        if so_name in _named_libs:
            return _named_libs[so_name]
        path = os.path.abspath(os.path.join(_NATIVE_DIR, so_name))
        lib = None
        try:
            if not os.path.exists(path):
                subprocess.run(["make", "-s", so_name],
                               cwd=os.path.abspath(_NATIVE_DIR),
                               check=True, capture_output=True)
            lib = ctypes.CDLL(path)
        except Exception as e:
            log.warning("native %s unavailable (%s); using python fallback",
                        so_name, e)
        _named_libs[so_name] = lib
        return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            log.warning("native dataio load failed (%s); using PIL fallback", e)
            _lib_failed = True
            return None
        lib.mss_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.mss_decode.restype = ctypes.c_int
        lib.mss_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.mss_decode_batch.restype = ctypes.c_int
        lib.mss_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.mss_normalize_crop.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.mss_mixup.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_float, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def _copy_out(lib, data_p, h, w, c) -> np.ndarray:
    n = h * w * c
    buf = np.ctypeslib.as_array(data_p, shape=(n,)).copy()
    lib.mss_free(data_p)
    arr = buf.reshape(h, w, c)
    return arr[..., 0] if c == 1 else arr


def decode(path: str) -> np.ndarray:
    """Decode an image file to HWC uint8 (HW for single-channel labels)."""
    lib = get_lib()
    if lib is None:
        from PIL import Image

        return np.asarray(Image.open(path))
    data_p = ctypes.POINTER(ctypes.c_uint8)()
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.mss_decode(path.encode(), ctypes.byref(data_p), ctypes.byref(h),
                        ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        from PIL import Image

        return np.asarray(Image.open(path))
    return _copy_out(lib, data_p, h.value, w.value, c.value)


def decode_batch(paths: Sequence[str]) -> List[np.ndarray]:
    """Decode several files on native threads (GIL released for the whole batch)."""
    lib = get_lib()
    if lib is None:
        return [decode(p) for p in paths]
    n = len(paths)
    arr_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    datas = (ctypes.POINTER(ctypes.c_uint8) * n)()
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    cs = (ctypes.c_int * n)()
    rc = lib.mss_decode_batch(arr_paths, n, datas, hs, ws, cs)
    if rc != 0:
        return [decode(p) for p in paths]
    return [_copy_out(lib, datas[i], hs[i], ws[i], cs[i]) for i in range(n)]


def normalize_crop(
    img_u8: np.ndarray, top: int, left: int, crop_h: int, crop_w: int,
    mean: Sequence[float], std: Sequence[float],
) -> np.ndarray:
    """Fused uint8 -> normalized fp32 crop. Falls back to numpy."""
    lib = get_lib()
    if lib is None or img_u8.ndim != 3 or img_u8.shape[2] != 3 or not img_u8.flags["C_CONTIGUOUS"]:
        crop = img_u8[top : top + crop_h, left : left + crop_w].astype(np.float32) / 255.0
        return (crop - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    out = np.empty((crop_h, crop_w, 3), np.float32)
    m = (ctypes.c_float * 3)(*[float(v) for v in mean])
    s = (ctypes.c_float * 3)(*[float(v) for v in std])
    lib.mss_normalize_crop(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img_u8.shape[0], img_u8.shape[1], top, left, crop_h, crop_w, m, s,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
