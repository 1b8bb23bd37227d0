"""ctypes bindings for the native C++ DICOM slice reader (native/fastdicom.cpp).

The shared library is built on demand with the repo's Makefile; every entry
point degrades to the pure-Python parser when the toolchain or library is
unavailable, so the native path is an accelerator, never a requirement.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastdicom.so")

_lib = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.isfile(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.fastdicom_probe.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_double)]
    lib.fastdicom_probe.restype = ctypes.c_int
    lib.fastdicom_decode.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64, ctypes.c_double]
    lib.fastdicom_decode.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def probe(path: str) -> Optional[dict]:
    """Slice metadata via the native parser, or None when unusable."""
    lib = _load()
    if lib is None:
        return None
    meta = (ctypes.c_double * 16)()
    if not lib.fastdicom_probe(path.encode(), meta):
        return None
    m = list(meta)
    return {
        "position": np.asarray(m[0:3]),
        "orientation": np.asarray(m[3:9]),
        "pixel_spacing": (m[9], m[10]),       # (row, col)
        "slope": m[11],
        "intercept": m[12],
        "rows": int(m[13]),
        "cols": int(m[14]),
        "is_ct": bool(m[15]),
    }


def decode_into(path: str, dst: np.ndarray, offset: float) -> bool:
    """Decode + rescale a slice's pixels into ``dst`` (float32, C-contiguous,
    rows*cols elements): dst = pixels*slope + intercept + offset."""
    lib = _load()
    if lib is None:
        return False
    assert dst.dtype == np.float32 and dst.flags.c_contiguous
    return bool(lib.fastdicom_decode(
        path.encode(),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst.size, offset,
    ))
