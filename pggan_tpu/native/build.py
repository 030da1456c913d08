"""JIT build + cache for the native loader — the `custom_ops.py` analog.

The reference JIT-compiles its CUDA extensions at first use with an
md5-keyed on-disk cache (`torch_utils/custom_ops.py:59-155`). Same pattern
here, minus nvcc: g++ compiles `loader.cpp` into a shared object cached
under ~/.cache/pggan_tpu/, keyed by a hash of the source + compile flags.
Build failure degrades gracefully (`native_available()` → False and the
Python/PIL path is used).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "loader.cpp")
_FLAGS = ["-O3", "-fPIC", "-shared", "-std=c++17", "-fopenmp"]
_LIBS = ["-ljpeg", "-lpng"]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _cache_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.md5(f.read() + " ".join(_FLAGS + _LIBS).encode()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "PGGAN_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "pggan_tpu"))
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"loader_{digest}.so")


def _build() -> Optional[ctypes.CDLL]:
    so_path = _cache_path()
    if not os.path.exists(so_path):
        # PID-unique temp: concurrent cold-cache builds must not interleave
        # writes into the same output file
        tmp = f"{so_path}.{os.getpid()}.tmp"
        cmd = ["g++", *_FLAGS, _SRC, "-o", tmp, *_LIBS]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)       # atomic publish; last writer wins
        except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
                FileNotFoundError) as exc:
            msg = getattr(exc, "stderr", b"")
            print(f"[pggan_tpu.native] build failed ({exc}); "
                  f"{msg[:500] if msg else ''} — falling back to PIL loader")
            return None
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    lib = ctypes.CDLL(so_path)
    lib.pggan_load_image.restype = ctypes.c_int
    lib.pggan_load_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.pggan_resize_image.restype = ctypes.c_int
    lib.pggan_resize_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    lib.pggan_augment_image.restype = ctypes.c_int
    lib.pggan_augment_image.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.pggan_probe_image.restype = ctypes.c_int
    lib.pggan_probe_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.pggan_decode_image.restype = ctypes.c_int
    lib.pggan_decode_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8)]
    return lib


def get_loader_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if not _tried:
            _tried = True
            _lib = _build()
        return _lib


def native_available() -> bool:
    return get_loader_lib() is not None
