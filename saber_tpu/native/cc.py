"""ctypes binding for the C++ connected-components kernel (cc.cpp).

Drop-in for scipy.ndimage.label on bool masks: returns (labels int32,
num_components); labels are compact 1..n with deterministic raster order.
Builds ``libsabercc.so`` with make/g++ on first import (cached); raises
ImportError when no toolchain exists so callers can fall back to scipy.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libsabercc.so")
_lock = threading.Lock()
_lib = None


def _build():
    src = os.path.join(_HERE, "cc.cpp")
    if not os.path.exists(src):
        raise ImportError("cc.cpp missing")
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
           "-o", _LIB_PATH, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        raise ImportError(f"native cc build failed: {e}") from e


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH)
                < os.path.getmtime(os.path.join(_HERE, "cc.cpp"))):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.cc_label_3d.restype = ctypes.c_int64
        lib.cc_label_3d.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def label(mask: np.ndarray, connectivity: int | None = None):
    """Connected components of a bool mask (2D or 3D).

    connectivity: scipy semantics (1=faces … ndim=full); None → full.
    Returns (labels int32 array, num_components).
    """
    lib = _get_lib()
    mask = np.ascontiguousarray(np.asarray(mask).astype(np.uint8))
    if mask.ndim == 2:
        shape3 = (1, *mask.shape)
    elif mask.ndim == 3:
        shape3 = mask.shape
    else:
        raise ValueError(f"expected 2D/3D mask, got {mask.ndim}D")
    conn = mask.ndim if connectivity is None else int(connectivity)
    # 2D connectivity maps onto the 3D kernel unchanged (dz never fires);
    # full 2D connectivity (2) needs 3D order ≥ 2
    out = np.zeros(shape3, np.int32)
    n = lib.cc_label_3d(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        shape3[0], shape3[1], shape3[2], conn,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if n < 0:
        raise RuntimeError("cc_label_3d failed")
    return out.reshape(mask.shape), int(n)
