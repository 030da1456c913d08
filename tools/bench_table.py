#!/usr/bin/env python
"""Regenerate the full per-scale benchmark table in ONE command.

Runs `bench.py` once per (scale, loss_mode) row — each in its OWN
subprocess: two loss modes at the same scale have identical input
signatures but different HLO, and this environment's remote compile
service deadlocks if one process compiles both (see
.claude/skills/verify/SKILL.md). Per-scale batch follows BASELINE.md's
round-3 schedule (16 through 512², 8 at 1024² — see DEFAULT_BATCH).

Emits one JSON document on stdout (every row + the bench metadata) and a
ready-to-paste markdown table on stderr, so BASELINE.md's table carries a
single vintage per refresh.

Usage:
    python tools/bench_table.py                     # full table
    python tools/bench_table.py --scales 6 8        # subset
    python tools/bench_table.py --out table.json
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Per-chip batch: 16 everywhere except 1024², where 8 is the largest
# that fits (round 3: hires_pack's unpadded layouts freed enough HBM to
# double the r2 batch — 4 → 8; 12/16 still OOM, measured).
DEFAULT_BATCH = {8: 8}


def run_row(scale, loss_mode, batch, steps, extra_env=None):
    cmd = [sys.executable, os.path.join(REPO, "bench.py"),
           "--scale", str(scale), "--batch_per_chip", str(batch),
           "--steps", str(steps), "--loss_mode", loss_mode]
    env = dict(os.environ)
    if extra_env:
        env.update(extra_env)
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=3600)
    if proc.returncode != 0:
        return {"scale": scale, "loss_mode": loss_mode, "batch": batch,
                "error": proc.stderr[-800:]}
    row = json.loads(proc.stdout.strip().splitlines()[-1])
    row.update({"scale": scale, "loss_mode": loss_mode, "batch": batch})
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=int, nargs="*",
                    default=[2, 3, 4, 5, 6, 7, 8])
    ap.add_argument("--loss_modes", nargs="*", default=None,
                    help="default: r1 at every scale + wgangp at 256/1024")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--repeat", type=int, default=1,
                    help="run each row N times (one subprocess each — the "
                         "compile cache makes repeats warm) and report "
                         "mean ± population σ across runs, attaching the "
                         "per-run values. Use >=5 to attach a variance bar "
                         "to a near-threshold multiplier (round-3 VERDICT: "
                         "wgangp's 2.99x vs 3.00x needs a ±σ to interpret).")
    ap.add_argument("--out", default=None, help="also write JSON here")
    ns = ap.parse_args(argv)

    rows = []
    for scale in ns.scales:
        batch = DEFAULT_BATCH.get(scale, 16)
        modes = ns.loss_modes or (
            ["r1", "wgangp"] if scale in (6, 8) else ["r1"])
        for mode in modes:
            # fewer timed steps where a step takes ~1s
            steps = ns.steps if scale < 7 else max(10, ns.steps // 3)
            print(f"[bench_table] scale {scale} ({2**(scale+2)}px) "
                  f"{mode} batch {batch} ...", file=sys.stderr)
            reps = []
            for i in range(max(1, ns.repeat)):
                row = run_row(scale, mode, batch, steps)
                reps.append(row)
                print(f"[bench_table]   -> "
                      f"{row.get('value', row.get('error', '?'))}",
                      file=sys.stderr)
            # Statistics over the SUCCESSFUL reps (a flaky device-service
            # hiccup in one rep must not void the whole variance bar);
            # failed reps are recorded, not hidden.
            ok = [r for r in reps if "error" not in r]
            row = dict(ok[0] if ok else reps[0])
            if ns.repeat > 1 and len(ok) >= 2:
                vals = [r["value"] for r in ok]
                vsb = [r["vs_baseline"] for r in ok]
                mean = sum(vals) / len(vals)
                std = (sum((v - mean) ** 2 for v in vals) / len(vals)) ** 0.5
                row["runs"] = vals
                row["value"] = round(mean, 2)
                row["value_std"] = round(std, 3)
                row["vs_baseline"] = round(sum(vsb) / len(vsb), 3)
                row["vs_baseline_std"] = round(
                    (sum((v - row["vs_baseline"]) ** 2 for v in vsb)
                     / len(vsb)) ** 0.5, 4)
                if len(ok) < len(reps):
                    row["failed_runs"] = [r["error"][-200:] for r in reps
                                          if "error" in r]
                print(f"[bench_table]   mean {row['value']} ± "
                      f"{row['value_std']} img/s (vs_baseline "
                      f"{row['vs_baseline']} ± {row['vs_baseline_std']}, "
                      f"n={len(vals)}/{len(reps)})", file=sys.stderr)
            rows.append(row)

    doc = {"rows": rows}
    print(json.dumps(doc, indent=1))
    if ns.out:
        with open(ns.out, "w") as f:
            json.dump(doc, f, indent=1)

    # markdown table for BASELINE.md
    print("\n| Scale | Res | mode | batch/chip | img/s/chip | step ms | "
          "MFU | vs_baseline |", file=sys.stderr)
    print("|---|---|---|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        if "error" in r:
            print(f"| {r['scale']} | {2**(r['scale']+2)} | {r['loss_mode']} "
                  f"| {r['batch']} | ERROR | | | |", file=sys.stderr)
            continue
        step_ms = 1000.0 * r["batch"] / r["value"]
        mfu = f"{r['mfu']:.3f}" if r.get("mfu") else "—"
        print(f"| {r['scale']} | {2**(r['scale']+2)} | {r['loss_mode']} | "
              f"{r['batch']} | **{r['value']}** | {step_ms:.1f} | {mfu} | "
              f"{r['vs_baseline']} |", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
