"""Image grid construction and saving.

Parity with `lib/utils.py:86-103`: rows = one per tensor list entry
(typically [real, fake]), at most 8 images per row, denormalized
x*0.5+0.5, written as JPEG. NHWC numpy in; cv2 (BGR) writer with a PIL
fallback.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np


def unpack_space_to_depth(img: np.ndarray) -> np.ndarray:
    """Host-side depth_to_space2: [B, h, w, 4C] → [B, 2h, 2w, C] with
    (a, b)-row-major subpixel groups — the numpy inverse of
    `ops/packed.space_to_depth2`. Eval/serving paths run the generator
    PACKED at hires_pack scales (the ≥512² layout-copy fix) and undo the
    packing here, on the host, where the transpose is free relative to
    the device-side relayout it replaces."""
    assert img.ndim == 4 and img.shape[-1] % 4 == 0, img.shape
    b, h, w, c4 = img.shape
    c = c4 // 4
    v = img.reshape(b, h, w, 2, 2, c)
    v = v.transpose(0, 1, 3, 2, 4, 5)
    return v.reshape(b, 2 * h, 2 * w, c)


def make_grid_image(list_of_batches: Sequence[np.ndarray], *,
                    max_per_row: int = 8, pad: int = 2) -> np.ndarray:
    """Stack batches into a grid: one row per batch, images side by side.

    Input: NHWC float arrays in [-1, 1]. Output: HWC float in [0, 1].
    Matches the reference's torchvision make_grid row layout
    (`lib/utils.py:94-103`) including the 2px padding.
    """
    rows: List[np.ndarray] = []
    width = None
    for batch in list_of_batches:
        batch = np.asarray(batch)[:max_per_row]
        n, h, w, c = batch.shape
        canvas = np.zeros((h + 2 * pad, n * (w + pad) + pad, c), np.float32)
        for i in range(n):
            x0 = pad + i * (w + pad)
            canvas[pad:pad + h, x0:x0 + w] = batch[i]
        canvas = canvas * 0.5 + 0.5
        if width is None:
            width = canvas.shape[1]
        if canvas.shape[1] < width:
            canvas = np.pad(canvas, ((0, 0), (0, width - canvas.shape[1]), (0, 0)))
        elif canvas.shape[1] > width:
            width = canvas.shape[1]
            rows = [np.pad(r, ((0, 0), (0, width - r.shape[1]), (0, 0))) for r in rows]
        rows.append(canvas)
    return np.clip(np.concatenate(rows, axis=0), 0.0, 1.0)


def save_image(save_root: str, run_id: str, global_step: int, subdir: str,
               list_of_batches: Sequence[np.ndarray]) -> str:
    """Write the [real, fake] sample grid (`lib/utils.py:86-92` layout:
    `{save_root}/{run_id}/{subdir}/e{step}.jpg`)."""
    dir_path = os.path.join(str(save_root), str(run_id), subdir)
    os.makedirs(dir_path, exist_ok=True)
    grid = (make_grid_image(list_of_batches) * 255.0).astype(np.uint8)
    path = os.path.join(dir_path, f"e{global_step}.jpg")
    try:
        import cv2
        # cv2.imwrite signals failure by RETURNING False, not raising —
        # treat it like an exception so the PIL fallback actually engages.
        if not cv2.imwrite(path, grid[:, :, ::-1]):
            raise IOError(f"cv2.imwrite returned False for {path}")
    except Exception:
        from PIL import Image
        Image.fromarray(grid).save(path, quality=95)
    return path
