"""Shared augmentation-parameter sampling.

One canonical host-side draw for the per-sample augmentation parameters
(horizontal flip + torchvision-semantics color jitter: each factor
U[max(0,1-v), 1+v], hue U[-h, h], applied in a uniformly-shuffled order —
`/root/reference/lib/dataset.py:103-108`), consumed in a FIXED rng order
(flip, 4 factors, shuffle) so every backend that augments — PIL
(`data/dataset.py`), the native C++ loader (`native/loader.py`), and the
device-resident cache (`data/device_cache.py`) — draws IDENTICAL
parameters from an equal per-sample seed. Factor sentinels mirror the
native ABI: -1.0 = factor disabled (brightness/contrast/saturation),
-2.0 = hue disabled / no augmentation.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

#: (brightness, contrast, saturation, hue) — the reference's jitter
#: strengths (`lib/dataset.py:103-106`).
DEFAULT_JITTER: Tuple[float, float, float, float] = (0.2, 0.2, 0.2, 0.01)


def draw_augment_params(rng: Optional[np.random.RandomState],
                        jitter: Tuple[float, float, float, float]
                        = DEFAULT_JITTER,
                        augment: bool = True):
    """Returns (flip: int, factors: f32[4], order: i32[4])."""
    if augment and rng is not None:
        flip = 1 if rng.rand() < 0.5 else 0
        b, c, s, h = jitter
        factors = np.array([
            rng.uniform(max(0.0, 1 - b), 1 + b) if b > 0 else -1.0,
            rng.uniform(max(0.0, 1 - c), 1 + c) if c > 0 else -1.0,
            rng.uniform(max(0.0, 1 - s), 1 + s) if s > 0 else -1.0,
            rng.uniform(-h, h) if h > 0 else -2.0,
        ], np.float32)
        order = np.arange(4, dtype=np.int32)
        rng.shuffle(order)
    else:
        flip = 0
        factors = np.full(4, -2.0, np.float32)
        order = np.arange(4, dtype=np.int32)
    return flip, factors, order
