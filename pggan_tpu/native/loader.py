"""Python face of the native C++ image loader."""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from pggan_tpu.native.build import get_loader_lib


class NativeImageLoader:
    """Decode (libjpeg/libpng) + antialiased resize + torchvision-order
    color jitter, all in C++ with the GIL released — a drop-in for the
    PIL path in `ImageFolderDataset`. ctypes calls release the GIL, so
    the data pipeline's worker threads scale across cores."""

    def __init__(self, resolution: int, *, augment: bool = True,
                 brightness: float = 0.2, contrast: float = 0.2,
                 saturation: float = 0.2, hue: float = 0.01):
        self.lib = get_loader_lib()
        if self.lib is None:
            raise RuntimeError("native loader unavailable (build failed)")
        self.resolution = int(resolution)
        self.augment = augment
        self.jitter = (brightness, contrast, saturation, hue)

    def _draw_augment(self, rng: Optional[np.random.RandomState]):
        """Consume the rng in a FIXED order (flip, 4 factors, shuffle) so
        load() and augment() draw identical parameters from equal seeds —
        the canonical draw shared with the device-cache backend lives in
        `data/augment.py`."""
        from pggan_tpu.data.augment import draw_augment_params
        return draw_augment_params(rng, self.jitter, self.augment)

    def load(self, path: str, rng: Optional[np.random.RandomState] = None
             ) -> np.ndarray:
        size = self.resolution
        out = np.empty((size, size, 3), np.uint8)
        flip, factors, order = self._draw_augment(rng)
        rc = self.lib.pggan_load_image(
            path.encode(), size, flip,
            factors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise IOError(f"native decode failed ({rc}): {path}")
        return out

    def resize(self, path: str) -> np.ndarray:
        """Decode + antialiased resize only — fills the decode cache."""
        size = self.resolution
        out = np.empty((size, size, 3), np.uint8)
        rc = self.lib.pggan_resize_image(
            path.encode(), size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise IOError(f"native decode failed ({rc}): {path}")
        return out

    def augment_cached(self, img: np.ndarray,
                       rng: Optional[np.random.RandomState]) -> np.ndarray:
        """Per-draw flip + jitter over a cached pre-resized uint8 image."""
        size = self.resolution
        assert img.shape == (size, size, 3) and img.dtype == np.uint8
        img = np.ascontiguousarray(img)
        out = np.empty((size, size, 3), np.uint8)
        flip, factors, order = self._draw_augment(rng)
        rc = self.lib.pggan_augment_image(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size, flip,
            factors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise IOError("native augment failed")
        return out

    def decode(self, path: str) -> np.ndarray:
        """Raw decode at source resolution (for tests/benchmarks)."""
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self.lib.pggan_probe_image(path.encode(), ctypes.byref(w),
                                        ctypes.byref(h))
        if rc != 0:
            raise IOError(f"native probe failed: {path}")
        out = np.empty((h.value, w.value, 3), np.uint8)
        rc = self.lib.pggan_decode_image(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise IOError(f"native decode failed: {path}")
        return out
