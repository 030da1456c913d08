#!/usr/bin/env python
"""Compare two training runs' metric trajectories (convergence evidence).

Built for the round-5 lazy-R1 claim: an equal-seed pair of runs that
differ ONLY in `r1_interval` must show matching FID trajectories at equal
step counts (stage minima within noise) for the lazy throughput
multiplier to count as an equal-quality recipe. Generic over any pair of
runs that log `fid`/`kid` through MetricLogger.

Prints one JSON object: per-run FID points, per-stage minima, the
stage-minimum deltas, and wall-clock/throughput summaries.

Usage:
  python tools/compare_runs.py train_result/kceleb64r1 \
      train_result/kceleb64lazyr1 --json
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def load_metrics(run_dir: str):
    path = os.path.join(run_dir, "metrics.jsonl")
    recs = [json.loads(l) for l in open(path)]
    return recs


def fid_points(recs):
    return [(r["step"], r["fid"], r.get("kid")) for r in recs if "fid" in r]


def stage_minima(points, stage_bounds):
    """Min FID within each [start, end) stage interval."""
    out = []
    for lo, hi in stage_bounds:
        vals = [(f, s) for (s, f, _k) in points if lo <= s < hi]
        out.append({"stage": f"[{lo},{hi})",
                    "min_fid": round(min(vals)[0], 3) if vals else None,
                    "at_step": min(vals)[1] if vals else None})
    return out


def throughput(recs):
    rates = [r["imgs_per_sec"] for r in recs if "imgs_per_sec" in r]
    if not rates:
        return None
    rates.sort()
    return {"median_img_s": round(rates[len(rates) // 2], 1),
            "n": len(rates)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("run_a")
    ap.add_argument("run_b")
    ap.add_argument("--stages", default=None,
                    help="comma-separated cumulative stage ends, e.g. "
                         "3000,9000,21000,33000,45000 (default: inferred "
                         "from the run config's max_step_at_scale)")
    ap.add_argument("--json", action="store_true")
    ns = ap.parse_args(argv)

    if ns.stages:
        ends = [int(x) for x in ns.stages.split(",")]
    else:
        import yaml
        run_id = os.path.basename(ns.run_a.rstrip("/"))
        cfg_path = os.path.join(ns.run_a, f"config_{run_id}.yaml")
        with open(cfg_path) as f:
            cfg = yaml.safe_load(f)
        acc, ends = 0, []
        for n in cfg["max_step_at_scale"]:
            acc += int(n)
            ends.append(acc)
    bounds = list(zip([0] + ends[:-1], ends))
    # include the final step (== total) in the last stage
    bounds[-1] = (bounds[-1][0], bounds[-1][1] + 1)

    out = {}
    for tag, run in (("a", ns.run_a), ("b", ns.run_b)):
        recs = load_metrics(run)
        pts = fid_points(recs)
        out[tag] = {
            "run": run,
            "fid_points": [(s, round(f, 3)) for s, f, _ in pts],
            "stage_minima": stage_minima(pts, bounds),
            "throughput": throughput(recs),
        }
    deltas = []
    for ma, mb in zip(out["a"]["stage_minima"], out["b"]["stage_minima"]):
        if ma["min_fid"] is not None and mb["min_fid"] is not None:
            deltas.append({"stage": ma["stage"],
                           "a": ma["min_fid"], "b": mb["min_fid"],
                           "delta": round(mb["min_fid"] - ma["min_fid"], 3),
                           "rel": round((mb["min_fid"] - ma["min_fid"])
                                        / ma["min_fid"], 4)})
    out["stage_min_deltas"] = deltas
    print(json.dumps(out if ns.json else out, indent=None if ns.json else 2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
