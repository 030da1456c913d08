#!/usr/bin/env python
"""Summarize a training run's metrics.jsonl: per-stage throughput, FID
trajectory, validation curves, wall-clock.

The trainer logs one JSON object per event (`utils/logging.py`): loss
rows every `loss_cycle` (with `imgs_per_sec`), `val_*` rows every
`test_cycle`, `fid` rows every `fid_cycle`. This reads any run directory
and prints a digest; `--json` emits one machine-readable object (the
BASELINE.md convergence records are generated from it).

Resume-aware: a run resumed from an earlier checkpoint re-logs the
replayed steps, so every series keeps only the LAST record per step
(later records supersede — they are the ones the final model state saw).

Reference role: the reference has no run summarizer; its only artifact
is stdout loss prints (`lib/utils.py:96-107`).

Usage:
    python tools/analyze_run.py train_result/kceleb256fid
    python tools/analyze_run.py train_result/kceleb256fid --json
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def load_metrics(run_dir):
    path = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def dedupe_last(rows, key):
    """Last record per step for rows containing `key`, in step order."""
    by_step = {}
    for r in rows:
        if key in r:
            by_step[r["step"]] = r
    return [by_step[s] for s in sorted(by_step)]


def stage_bounds(cfg):
    """Cumulative scale-jump steps from max_step_at_scale (schedule.py
    equality-jump semantics: stage i covers (bounds[i], bounds[i+1]])."""
    steps = list(cfg.get("max_step_at_scale", []))
    bounds, acc = [0], 0
    for s in steps:
        acc += int(s)
        bounds.append(acc)
    return bounds


def load_cfg(run_dir):
    for name in os.listdir(run_dir):
        if name.startswith("config_") and name.endswith(".yaml"):
            import yaml
            with open(os.path.join(run_dir, name)) as f:
                return yaml.safe_load(f)
    return {}


def summarize(run_dir):
    rows = load_metrics(run_dir)
    cfg = load_cfg(run_dir)
    loss = dedupe_last(rows, "imgs_per_sec")
    fids = dedupe_last(rows, "fid")
    vals = dedupe_last(rows, "val_L_D")
    bounds = stage_bounds(cfg)

    stages = []
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        seg = [r for r in loss if lo < r["step"] <= hi]
        if not seg:
            continue
        ips = sorted(r["imgs_per_sec"] for r in seg)
        stages.append({
            "resolution": 4 * 2 ** i,
            "steps": [lo, hi],
            "median_imgs_per_sec": round(ips[len(ips) // 2], 1),
            "last_step_seen": seg[-1]["step"],
            "wall_min": round((seg[-1]["time"] - seg[0]["time"]) / 60, 1),
        })

    doc = {
        "run": os.path.basename(os.path.normpath(run_dir)),
        "last_step": loss[-1]["step"] if loss else 0,
        "total_wall_h": round(
            (rows[-1]["time"] - rows[0]["time"]) / 3600, 2) if rows else 0,
        "stages": stages,
        "fid": [{"step": r["step"], "fid": round(r["fid"], 2),
                 **({"kid": round(r["kid"], 5)} if "kid" in r else {})}
                for r in fids],
        "val": [{"step": r["step"],
                 "val_L_D": round(r["val_L_D"], 3),
                 "val_L_G": round(r["val_L_G"], 3),
                 "val_D_real": round(r["val_D_real"], 3),
                 "val_D_fake": round(r["val_D_fake"], 3)} for r in vals],
    }
    return doc


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--json", action="store_true",
                    help="emit one machine-readable JSON object")
    ns = ap.parse_args(argv)
    doc = summarize(ns.run_dir)
    if ns.json:
        print(json.dumps(doc))
        return 0
    print(f"run {doc['run']}: {doc['last_step']} steps, "
          f"{doc['total_wall_h']} h wall")
    print("\n| Res | steps | median img/s | wall min |")
    print("|---|---|---|---|")
    for s in doc["stages"]:
        print(f"| {s['resolution']}² | {s['steps'][0]}→{s['steps'][1]} | "
              f"{s['median_imgs_per_sec']} | {s['wall_min']} |")
    if doc["fid"]:
        print("\nFID trajectory:")
        print("  " + "  ".join(f"{r['step']}:{r['fid']}" for r in doc["fid"]))
        if any("kid" in r for r in doc["fid"]):
            print("KID trajectory (unbiased — level meaningful at small n):")
            print("  " + "  ".join(f"{r['step']}:{r.get('kid', '-')}"
                                   for r in doc["fid"]))
    if doc["val"]:
        last = doc["val"][-1]
        print(f"\nlast validation (step {last['step']}): "
              f"val_L_D={last['val_L_D']} val_L_G={last['val_L_G']} "
              f"val_D_real={last['val_D_real']} val_D_fake={last['val_D_fake']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
