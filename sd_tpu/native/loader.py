"""ctypes front-end for the native C++ image loader.

Builds `image_loader.cc` into `_image_loader.so` on first use (g++, linked
against the system libjpeg/libpng) and exposes:

    decode_resize(path, size, method, center_crop) -> np.ndarray | None
    load_batch(paths, size, method, center_crop, threads) -> (arr, ok_mask)

Both return float32 HWC images in [-1, 1], matching the PIL path in
`sd_tpu.data.datasets._load_image` (reference semantics:
DDPM/ImageDataset.py:9-47 — resize + /127.5 - 1). `None` / ok_mask=False
means the caller should fall back to PIL (unsupported format, CMYK JPEG,
truncated file).

Opt out with SD_TPU_NATIVE_LOADER=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_METHODS = {"bilinear": 0, "bicubic": 1}

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "image_loader.cc")
_SO = os.path.join(_HERE, "_image_loader.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-fPIC", "-shared", "-std=c++17",
        "-o", _SO, _SRC, "-ljpeg", "-lpng", "-pthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    return proc.returncode == 0 and os.path.exists(_SO)


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("SD_TPU_NATIVE_LOADER", "1") == "0":
            return None
        # Rebuild when the source is newer than the cached .so.
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.sdtpu_decode_resize_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.sdtpu_decode_resize_file.restype = ctypes.c_int
        lib.sdtpu_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ]
        lib.sdtpu_load_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native loader built and loaded on this host."""
    return _load() is not None


def library_path() -> str | None:
    return _SO if available() else None


def decode_resize(path: str, size: int, method: str = "bicubic",
                  center_crop: bool = False) -> np.ndarray | None:
    """Decode + resample one image natively; None → use the PIL fallback."""
    lib = _load()
    if lib is None or method not in _METHODS:
        return None
    out = np.empty((size, size, 3), np.float32)
    rc = lib.sdtpu_decode_resize_file(
        os.fsencode(path), size, int(center_crop), _METHODS[method],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def load_batch(paths, size: int, method: str = "bicubic",
               center_crop: bool = False, threads: int | None = None):
    """Decode a batch on a native thread pool (GIL released for the whole
    batch). Returns (float32[n, size, size, 3], ok_mask[n]); failed slots
    are zero-filled and flagged for a PIL retry by the caller."""
    lib = _load()
    n = len(paths)
    out = np.zeros((n, size, size, 3), np.float32)
    if lib is None or method not in _METHODS or n == 0:
        return out, np.zeros((n,), bool)
    if threads is None:
        threads = min(n, os.cpu_count() or 1)
    c_paths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    status = np.empty((n,), np.int32)
    lib.sdtpu_load_batch(
        c_paths, n, size, int(center_crop), _METHODS[method], threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, status == 0
