"""ctypes bindings to the native runtime library (librtnative.so).

The reference keeps its runtime tier native (C++ stb_image_write for IO,
Game.cpp:27-43); this framework does the same: native/rtnative.cpp provides
image encoders and the reference-semantics oracle used by golden tests.
Everything degrades gracefully to pure Python when the library isn't built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "librtnative.so"),
    os.path.join(os.path.dirname(__file__), "librtnative.so"),
]

_lib = None
_checked = False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
            except OSError:
                continue
            lib.rt_encode_bmp.restype = ctypes.c_longlong
            lib.rt_encode_bmp.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_longlong,
            ]
            _lib = lib
            break
    return _lib


def try_encode(ext: str, img: np.ndarray) -> Optional[bytes]:
    """Encode via the native library; None if unavailable for this format."""
    lib = load()
    if lib is None or ext != ".bmp":
        return None
    h, w, _ = img.shape
    img = np.ascontiguousarray(img)
    cap = 14 + 40 + ((w * 3 + 3) & ~3) * h
    out = ctypes.create_string_buffer(cap)
    n = lib.rt_encode_bmp(img.ctypes.data, w, h, out, cap)
    if n <= 0:
        return None
    return out.raw[:n]
