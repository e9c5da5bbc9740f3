"""ctypes bindings for the native host-side preprocessing library.

Builds ``native/libblurr_native.so`` on first use (g++, no external deps) and
degrades gracefully to cv2/PIL when the toolchain is unavailable. Used by the
env adapters for the per-control-step camera resize.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[1] / "native"
_LIB_PATH = _NATIVE_DIR / "libblurr_native.so"
_lib = None
_load_failed = False
_build_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception as exc:
        log.debug("native build failed: %s", exc)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _build_lock:  # one make / one dlopen per process
        if _lib is not None or _load_failed:
            return _lib
        # ALWAYS run make: the Makefile's source prerequisite makes it an
        # incremental no-op when fresh, and rebuilds after preprocess.cpp
        # edits (an exists() check would silently load a stale .so)
        if not _build() and not _LIB_PATH.exists():
            _load_failed = True
            return None
        return _load()


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.lanczos4_resize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.lanczos4_resize_normalize_chw.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
        ]
        lib.blurr_native_version.restype = ctypes.c_int
        assert lib.blurr_native_version() == 1
        _lib = lib
    except Exception as exc:
        log.warning("native library load failed: %s", exc)
        _load_failed = True
    return _lib


def available() -> bool:
    return get_lib() is not None


def lanczos4_resize(image: np.ndarray, out_hw) -> Optional[np.ndarray]:
    """uint8 [H, W, C] -> uint8 [out_h, out_w, C]; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, np.uint8)
    h, w, c = image.shape
    out_h, out_w = out_hw
    out = np.empty((out_h, out_w, c), np.uint8)
    lib.lanczos4_resize_u8(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w,
    )
    return out


def lanczos4_resize_normalize_chw(
    image: np.ndarray, out_hw, mean: float = 0.5, std: float = 0.5
) -> Optional[np.ndarray]:
    """uint8 [H, W, 3] -> float32 [3, out_h, out_w] ((x/255 - mean) / std)."""
    lib = get_lib()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, np.uint8)
    h, w, c = image.shape
    assert c == 3, c
    out_h, out_w = out_hw
    out = np.empty((3, out_h, out_w), np.float32)
    lib.lanczos4_resize_normalize_chw(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w,
        ctypes.c_float(mean), ctypes.c_float(std),
    )
    return out
