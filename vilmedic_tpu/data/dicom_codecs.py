"""ctypes binding for the native DICOM codecs (``native/dicom_codecs.cpp``).

JPEG Lossless (SOF3) and RLE segment decoding for compressed DICOM transfer
syntaxes (the pydicom-plugin equivalent, reference ImageDataset.py:126-134).
Built with g++ on first use, cached under ``native/build``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "dicom_codecs.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libdicom_codecs.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        stale = (
            os.path.exists(_SO) and os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        )
        if (not os.path.exists(_SO) or stale) and not _build():
            return None
        lib = ctypes.CDLL(_SO)
        lib.decode_jpeg_lossless.restype = ctypes.c_int
        lib.decode_jpeg_lossless.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.decode_rle_segment.restype = ctypes.c_long
        lib.decode_rle_segment.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ]
        _lib = lib
        return _lib


def decode_jpeg_lossless(data: bytes) -> Tuple[np.ndarray, int]:
    """-> (array (H, W) or (H, W, C) uint16, precision). Raises on failure."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native dicom codecs unavailable (no g++?)")
    cap = 1 << 26  # 64M samples upper bound (8k x 8k)
    out = np.empty((cap,), np.uint16)
    w = ctypes.c_int()
    h = ctypes.c_int()
    prec = ctypes.c_int()
    ncomp = ctypes.c_int()
    rc = lib.decode_jpeg_lossless(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), cap,
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(prec), ctypes.byref(ncomp),
    )
    if rc != 0:
        raise ValueError(f"JPEG lossless decode failed (rc={rc})")
    total = w.value * h.value * ncomp.value
    arr = out[:total].copy()
    shape = (h.value, w.value) if ncomp.value == 1 else (h.value, w.value, ncomp.value)
    return arr.reshape(shape), prec.value


def decode_rle_segment(data: bytes, expected: int) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native dicom codecs unavailable (no g++?)")
    out = np.empty((expected,), np.uint8)
    n = lib.decode_rle_segment(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        expected,
    )
    if n < 0:
        raise ValueError("RLE segment decode failed")
    return out[:n]
