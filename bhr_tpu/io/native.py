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
            try:  # EXR entry points (absent in pre-round-2 builds of the .so)
                lib.bhr_exr_available.restype = ctypes.c_int
                lib.bhr_exr_error.restype = ctypes.c_char_p
                lib.bhr_exr_size.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int),
                ]
                lib.bhr_exr_size.restype = ctypes.c_int
                lib.bhr_exr_read.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_float),
                ]
                lib.bhr_exr_read.restype = ctypes.c_int
                lib.bhr_exr_write.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.c_int,
                ]
                lib.bhr_exr_write.restype = ctypes.c_int
            except AttributeError:
                pass
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


# -- EXR via the system OpenEXR library (native/bhr_exr.cpp) ----------------
# Full-coverage decode (PIZ, PXR24, B44, DWA, tiled) — the schemes the pure-
# Python reader in skybox.py does not implement. compression enum values are
# OpenEXR's (0=NONE, 2=ZIPS, 3=ZIP, 4=PIZ).

EXR_COMPRESSION = {"none": 0, "rle": 1, "zips": 2, "zip": 3, "piz": 4}


def exr_available() -> bool:
    lib = _load()
    try:
        return bool(lib is not None and lib.bhr_exr_available())
    except AttributeError:
        return False


def _exr_err(lib) -> str:
    try:
        return lib.bhr_exr_error().decode(errors="replace")
    except Exception:
        return "unknown native EXR error"


def read_exr_native(path: str) -> np.ndarray:
    """Decode any EXR to fp32 (H, W, 4) RGBA via OpenEXR."""
    lib = _load()
    if lib is None or not exr_available():
        raise RuntimeError("native EXR support unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.bhr_exr_size(path.encode(), ctypes.byref(w), ctypes.byref(h)):
        raise IOError(f"EXR open failed for {path}: {_exr_err(lib)}")
    out = np.empty((h.value, w.value, 4), np.float32)
    if lib.bhr_exr_read(path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))):
        raise IOError(f"EXR decode failed for {path}: {_exr_err(lib)}")
    return out


def write_exr_native(
    path: str, rgba: np.ndarray, compression: str = "piz", half: bool = True
) -> None:
    """Encode fp32 (H, W, >=3) RGBA to EXR via OpenEXR (PIZ by default —
    the scheme real star-map assets ship with; used for tests/assets)."""
    lib = _load()
    if lib is None or not exr_available():
        raise RuntimeError("native EXR support unavailable")
    rgba = np.asarray(rgba, np.float32)
    if rgba.ndim != 3 or rgba.shape[2] < 3:
        raise ValueError("expected (H, W, >=3) RGBA array")
    if rgba.shape[2] == 3:
        rgba = np.concatenate(
            [rgba, np.ones(rgba.shape[:2] + (1,), np.float32)], axis=-1
        )
    rgba = np.ascontiguousarray(rgba[..., :4])
    hgt, wid = rgba.shape[:2]
    comp = EXR_COMPRESSION[compression] if isinstance(compression, str) else int(compression)
    rc = lib.bhr_exr_write(
        path.encode(),
        rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wid, hgt, comp, int(bool(half)),
    )
    if rc:
        raise IOError(f"EXR encode failed for {path}: {_exr_err(lib)}")
