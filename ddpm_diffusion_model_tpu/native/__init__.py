"""Native (C++) input-pipeline bindings.

Builds ``image_pipeline.cpp`` into a shared library on first use (g++ -O3,
linked against libjpeg/libpng) and exposes it through ctypes — ctypes calls
release the GIL, so the Python thread-pool loader gets true parallel native
decode.  Falls back cleanly (returns None) when no toolchain or headers are
available; callers then use the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["load_library", "native_available", "decode_image_file", "decode_image_bytes"]

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "src", "image_pipeline.cpp")
_OUT = os.path.join(os.path.dirname(__file__), "_image_pipeline.so")


def _build() -> Optional[str]:
    have_out = os.path.exists(_OUT)
    if not os.path.exists(_SRC):
        # pruned checkout / installed wheel: a prebuilt .so is usable as-is;
        # with neither present the PIL fallback must engage, not a crash
        return _OUT if have_out else None
    if have_out and os.path.getmtime(_OUT) >= os.path.getmtime(_SRC):
        return _OUT
    # compile to a per-process temp name and move into place atomically —
    # concurrent processes (multihost sim) racing on _OUT would otherwise
    # interleave writes and CDLL a truncated library
    tmp = f"{_OUT}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", tmp, "-ljpeg", "-lpng",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _OUT)
        return _OUT
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.ddpm_decode_image_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.ddpm_decode_image_file.restype = ctypes.c_int
        lib.ddpm_decode_image_bytes.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.ddpm_decode_image_bytes.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return load_library() is not None


def decode_image_file(
    path: str, out_size: int, crop: int = 0, init_resize: int = 0
) -> Optional[np.ndarray]:
    """Decode + transform one image file to (out_size, out_size, 3) float32
    in [-1, 1].  None on any failure (caller falls back to PIL)."""
    lib = load_library()
    if lib is None:
        return None
    out = np.empty((out_size, out_size, 3), dtype=np.float32)
    rc = lib.ddpm_decode_image_file(
        path.encode(), int(init_resize), int(crop), int(out_size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def decode_image_bytes(
    data: bytes, out_size: int, crop: int = 0, init_resize: int = 0
) -> Optional[np.ndarray]:
    lib = load_library()
    if lib is None:
        return None
    out = np.empty((out_size, out_size, 3), dtype=np.float32)
    rc = lib.ddpm_decode_image_bytes(
        data, len(data), int(init_resize), int(crop), int(out_size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None
