"""ctypes bindings for the native C++ I/O runtime (native/bhr_native.cpp).

Auto-builds libbhr_native.so with `make` on first use; every entry point
degrades gracefully to the pure-Python path when the toolchain or library is
unavailable (BHR_NO_NATIVE=1 disables it explicitly).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libbhr_native.so"))

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("BHR_NO_NATIVE"):
            return None
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-s"],
                    cwd=os.path.abspath(_NATIVE_DIR),
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.bhr_write_png.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.bhr_write_png.restype = ctypes.c_int
            lib.bhr_submit_frame.argtypes = lib.bhr_write_png.argtypes
            lib.bhr_submit_frame.restype = ctypes.c_int
            lib.bhr_drain.restype = ctypes.c_int
            lib.bhr_pending.restype = ctypes.c_int
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _as_ptr(rgba: np.ndarray):
    rgba = np.ascontiguousarray(rgba, np.uint8)
    return rgba, rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def write_png(path: str, rgba: np.ndarray) -> None:
    """Synchronous native PNG write."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    h, w = rgba.shape[:2]
    arr, ptr = _as_ptr(rgba)
    rc = lib.bhr_write_png(path.encode(), ptr, w, h)
    if rc != 0:
        raise IOError(f"bhr_write_png failed with code {rc} for {path}")


def submit_frame(path: str, rgba: np.ndarray) -> None:
    """Asynchronous PNG write on the native worker pool (copies the buffer)."""
    lib = _load()
    if lib is None:
        write_png_fallback(path, rgba)
        return
    h, w = rgba.shape[:2]
    arr, ptr = _as_ptr(rgba)
    lib.bhr_submit_frame(path.encode(), ptr, w, h)


def drain() -> int:
    """Wait for all queued native writes; returns the number of failures."""
    lib = _load()
    return lib.bhr_drain() if lib is not None else 0


def pending() -> int:
    lib = _load()
    return lib.bhr_pending() if lib is not None else 0


def write_png_fallback(path: str, rgba: np.ndarray) -> None:
    from .image import _save_png

    _save_png(np.ascontiguousarray(rgba, np.uint8), path)
