#!/usr/bin/env python
"""Generate a synthetic on-disk image tree at the reference's dataset scale.

The reference trained on 37,345 front-face JPEGs discovered by a recursive
folder glob (`/root/reference/README.md:7`, `lib/dataset.py:91-99`), but the
only sample that ships is 29 photos — so every end-to-end run before round 5
exercised the input pipeline at N=29. This tool builds a dataset of the
reference's REAL cardinality (default 37,345 images, 1024x1024 JPEG, sharded
subdirectories so the recursive glob does real work) with no egress and no
faces: each image is a seeded procedural texture (low-frequency color field +
mid-frequency detail), which compresses/decodes like an ordinary photographic
JPEG pipeline input and makes runs reproducible.

Layout: <out>/shard_NNN/img_NNNNNNN.jpg  (256 images per shard dir).

Usage:
  python tools/make_synth_dataset.py --out datasets/synth37k          # full N
  python tools/make_synth_dataset.py --out /tmp/d --n 512 --res 256   # small

Generation is resumable: existing non-empty files are skipped, so an
interrupted run continues where it left off.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
from PIL import Image

SHARD_SIZE = 256


def synth_image(seed: int, res: int) -> Image.Image:
    """Deterministic procedural texture: 16x16 color field upsampled
    (low-frequency structure, like lighting/background), plus a 64x64
    detail layer (mid-frequency, like features/texture). Composed at
    256x256 then resized to target res — keeps per-image cost ~tens of
    ms on one core at 1024x1024 while producing JPEGs with realistic
    spectral content for decode benchmarking."""
    r = np.random.RandomState(seed)
    base = r.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    low = np.asarray(Image.fromarray(base).resize((256, 256), Image.BILINEAR),
                     dtype=np.int16)
    detail = r.randint(-48, 49, (64, 64, 1), dtype=np.int16)
    detail = np.repeat(np.repeat(detail, 4, axis=0), 4, axis=1)
    img = np.clip(low + detail, 0, 255).astype(np.uint8)
    out = Image.fromarray(img)
    if res != 256:
        out = out.resize((res, res), Image.BILINEAR)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=37345,
                    help="number of images (default: the reference's "
                         "dataset size, README.md:7)")
    ap.add_argument("--res", type=int, default=1024,
                    help="source image resolution (the bundled k-celeb "
                         "samples are 1024x1024)")
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--seed", type=int, default=0)
    ns = ap.parse_args(argv)

    t0 = time.time()
    made = skipped = 0
    for i in range(ns.n):
        shard = os.path.join(ns.out, f"shard_{i // SHARD_SIZE:03d}")
        path = os.path.join(shard, f"img_{i:07d}.jpg")
        if os.path.exists(path) and os.path.getsize(path) > 0:
            skipped += 1
            continue
        os.makedirs(shard, exist_ok=True)
        img = synth_image(ns.seed + i, ns.res)
        tmp = path + ".tmp"
        img.save(tmp, "JPEG", quality=ns.quality)
        os.replace(tmp, path)   # atomic: no truncated JPEGs on interrupt
        made += 1
        if made % 1000 == 0:
            rate = made / (time.time() - t0)
            eta = (ns.n - i - 1) / max(rate, 1e-9)
            print(f"[synth] {i + 1}/{ns.n} ({rate:.0f} img/s, eta {eta/60:.1f} min)",
                  flush=True)
    dt = time.time() - t0
    print(f"[synth] done: {made} written, {skipped} existing, "
          f"{dt/60:.1f} min -> {ns.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
