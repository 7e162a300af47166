"""ctypes bindings for the native C++ runtime (native/merkle.cpp).

Builds the shared library on first use (g++ -O3, cached under build/) and
falls back silently to pure Python if the toolchain is unavailable — callers
(verify/merkle.py) treat this module as an optional accelerator.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "merkle.cpp")
_SO = os.path.join(_ROOT, "build", "libdvdx_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or \
                    os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                os.makedirs(os.path.dirname(_SO), exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-march=native", "-pthread", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_SO)
            lib.dvdx_sha256_leaves.argtypes = [
                ctypes.POINTER(ctypes.c_uint16), ctypes.c_char_p,
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_int,
            ]
            lib.dvdx_merkle_root.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ]
            lib.dvdx_sha256.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def sha256_leaves(timesteps: np.ndarray, zs: np.ndarray, epss: np.ndarray,
                  n_threads: int = 0) -> List[bytes]:
    """Leaf hashes sha256(t_be16 || z_bytes || eps_bytes) per step.
    zs/epss: (N, ...) arrays, any dtype; hashed as raw bytes."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(timesteps)
    ts = np.ascontiguousarray(timesteps, dtype=np.uint16)
    za = np.ascontiguousarray(zs)
    ea = np.ascontiguousarray(epss)
    bpt = za.nbytes // n
    if ea.nbytes // n != bpt:
        raise ValueError("z/eps byte size mismatch")
    out = ctypes.create_string_buffer(32 * n)
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    lib.dvdx_sha256_leaves(
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        za.ctypes.data_as(ctypes.c_char_p),
        ea.ctypes.data_as(ctypes.c_char_p),
        n, bpt, out, n_threads,
    )
    raw = out.raw
    return [raw[32 * i : 32 * (i + 1)] for i in range(n)]


def merkle_root(leaves: List[bytes]) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    blob = b"".join(leaves)
    out = ctypes.create_string_buffer(32)
    lib.dvdx_merkle_root(blob, len(leaves), out)
    return out.raw


def sha256(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = ctypes.create_string_buffer(32)
    lib.dvdx_sha256(data, len(data), out)
    return out.raw
