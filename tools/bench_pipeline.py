#!/usr/bin/env python
"""Host input-pipeline benchmark at the reference's real dataset scale.

The reference trained on 37,345 images discovered by a recursive folder
glob (`/root/reference/README.md:7`, `lib/dataset.py:91-99`); every
end-to-end run before round 5 used the 29 bundled samples, where ALL
cache tiers trivially fit. This tool measures the pipeline alone (no
device) at realistic N so the tier boundaries and their fallback rates
are evidence, not reasoning:

  tier 1  RAM decode cache  (resized set <= decode_cache_mb)
  tier 3  out-of-core resized store (memmap built once per scale)
  tier 0  no cache (per-draw source decode — the regime the reference's
          torch DataLoader lived in, `lib/model.py:50-52`)

Per variant it reports: dataset construction (incl. cache/store build)
time, steady-state augmented draw rate through DataPipeline (the real
producer/prefetch machinery the trainer uses), and host RSS growth.

Usage:
  python tools/bench_pipeline.py --root datasets/synth37k --scale 5 \
      --tier ram --draws 2048 --json >> evidence/pipeline_37k.jsonl

Pure host work — safe during device outages; does not import jax.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--scale", type=int, required=True,
                    help="scale index; resolution = 2**(scale+2)")
    ap.add_argument("--tier", choices=["ram", "store", "none", "auto"],
                    default="auto",
                    help="cache tier to force (auto = production policy)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--draws", type=int, default=2048,
                    help="steady-state images to draw (after warmup)")
    ap.add_argument("--warmup", type=int, default=256,
                    help="images drawn before timing starts (first-touch "
                         "decodes for the RAM tier land here only when "
                         "draws+warmup >= N; construction covers the "
                         "store build)")
    ap.add_argument("--decode_cache_mb", type=int, default=8192)
    ap.add_argument("--store_dir", default=None)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--fill", action="store_true",
                    help="pre-fill the RAM decode cache (full pass over N) "
                         "before timing, reporting the fill time — measures "
                         "the post-first-epoch steady state")
    ap.add_argument("--json", action="store_true")
    ns = ap.parse_args(argv)

    from pggan_tpu.data.dataset import ImageFolderDataset
    from pggan_tpu.data.pipeline import DataPipeline

    tier_kw = {
        "ram":   dict(cache_decoded=True, resized_store=False),
        "store": dict(cache_decoded=False, resized_store=True),
        "none":  dict(cache_decoded=False, resized_store=False),
        "auto":  dict(cache_decoded="auto", resized_store="auto"),
    }[ns.tier]
    store_dir = ns.store_dir
    if store_dir is None and ns.tier in ("store", "auto"):
        store_dir = os.path.join(os.path.dirname(ns.root.rstrip("/")) or ".",
                                 "resized_store")

    rss0 = rss_mb()
    t0 = time.time()
    ds = ImageFolderDataset([ns.root], ns.scale, is_master=True,
                            decode_cache_mb=ns.decode_cache_mb,
                            store_dir=store_dir, **tier_kw)
    t_construct = time.time() - t0
    n = len(ds)
    res = ds.resolution

    tier_used = ("store" if ds._store is not None
                 else "ram" if ds._cache is not None else "none")
    resized_gb = n * res * res * 3 / 1e9

    # RAM tier fills lazily per first touch; to measure the post-epoch
    # steady state (what the trainer sees for the rest of the scale's
    # thousands of steps) pre-fill it explicitly — and time that, since
    # the fill IS the once-per-scale decode cost the trainer pays spread
    # over its first epoch. (Store construction already decoded all N.)
    t_fill = None
    if ns.fill and ds._cache is not None:
        t0 = time.time()
        for i in range(n):
            ds.resized_array(i)
        t_fill = time.time() - t0

    pipe = DataPipeline(ds, ns.batch, num_workers=ns.workers,
                        prefetch_depth=2, seed=0)
    try:
        it = iter(pipe)
        drawn = 0
        while drawn < ns.warmup:
            next(it)
            drawn += ns.batch
        t0 = time.time()
        drawn = 0
        checksum = 0
        while drawn < ns.draws:
            b = next(it)
            checksum += int(np.asarray(b[0, 0, 0]).sum())
            drawn += ns.batch
        dt = time.time() - t0
    finally:
        pipe.close()

    rec = {
        "n_images": n, "resolution": res, "tier_requested": ns.tier,
        "tier_used": tier_used, "resized_gb": round(resized_gb, 2),
        "construct_s": round(t_construct, 1),
        "fill_s": round(t_fill, 1) if t_fill is not None else None,
        "draw_img_s": round(drawn / dt, 1),
        "batch": ns.batch, "draws": drawn, "workers": ns.workers,
        "rss_mb_start": round(rss0, 1), "rss_mb_peak": round(rss_mb(), 1),
        "checksum": checksum % 1000003,
    }
    if ns.json:
        print(json.dumps(rec))
    else:
        print(json.dumps(rec, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
