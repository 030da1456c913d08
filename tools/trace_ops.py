#!/usr/bin/env python
"""Aggregate per-op device time from an XProf trace (speed-of-light audit).

Usage: python tools/trace_ops.py /tmp/xprof_s8 [--top 25] [--steps 3]

Finds the newest trace.json.gz under the logdir, buckets TensorCore op
events by XLA category (fusion kinds, copy/transpose, convolution, ...)
and prints totals + the top individual ops, divided by --steps to give
per-step costs. This is the parser behind BASELINE.md's layout-copy and
MXU-efficiency numbers.
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
from typing import Optional


def find_trace(logdir):
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        paths = glob.glob(os.path.join(logdir, "**", "trace.json.gz"),
                          recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {logdir}")
    return max(paths, key=os.path.getmtime)


def classify(name):
    n = name.lower()
    if n.startswith("copy") or ".copy" in n or n.startswith("transpose"):
        return "copy/transpose"
    for kind in ("loop_convolution", "convolution"):
        if kind in n:
            return "convolution"
    for kind in ("loop_fusion", "input_fusion", "output_fusion", "fusion"):
        if kind in n:
            return "fusion:" + (n.split(".")[0] if "." in n else kind)
    for kind in ("reduce", "broadcast", "reverse", "select", "scatter",
                 "dynamic-update", "all-reduce", "rng", "iota", "dot",
                 "concatenate", "slice", "pad", "bitcast", "convert"):
        if kind in n:
            return kind
    return "other"


_SHAPE_RE = None


def _physical_bytes(long_name: str) -> Optional[int]:
    """Estimate PHYSICAL HBM bytes for every shaped tensor in an HLO
    long_name (output + operands), honoring TPU tiled layouts.

    XLA lays tensors out in (sublane, lane) tiles — `T(8,128)` for f32,
    with a `(2,1)`/`(4,1)` packing suffix for 16/8-bit types — and PADS
    the two minor-most dims up to the tile. A bf16[...,64] tensor
    therefore occupies 2× its logical bytes in HBM (64 → 128 lanes), and
    bytes_accessed (logical) understates true traffic by exactly that
    factor. This estimator reproduces XLA's padding arithmetic so the
    roofline can report achieved PHYSICAL bandwidth; tokens living in
    scalar/SMEM space (`S(1)`…) and untiled 1-D scalars are counted
    logically. Returns None when no shaped token parses.
    """
    global _SHAPE_RE
    if _SHAPE_RE is None:
        import re
        # dtype[dims]{perm:T(tiles)...}  — layout block optional
        _SHAPE_RE = re.compile(
            r"\b([a-z]+\d+)\[([\d,]*)\]"          # dtype [d0,d1,...]
            r"(?:\{([\d,]*)"                       # {perm
            r"(?::T\(([^)]*)\)(?:\((\d+),1\))?)?"  # :T(8,128) (2,1)
            r"[^}]*\})?")
    bits = {"f32": 32, "s32": 32, "u32": 32, "bf16": 16, "f16": 16,
            "s16": 16, "u16": 16, "s8": 8, "u8": 8, "pred": 8,
            "f64": 64, "s64": 64, "u64": 64}
    total, found = 0, False
    for m in _SHAPE_RE.finditer(long_name):
        dt, dims_s, perm_s, tile_s, pack_s = m.groups()
        if dt not in bits:
            continue
        dims = [int(d) for d in dims_s.split(",") if d] if dims_s else []
        nbytes = bits[dt] // 8
        if not dims:
            total += nbytes
            found = True
            continue
        padded = list(dims)
        if tile_s and perm_s:
            tile = [int(t) for t in tile_s.split(",") if t]
            perm = [int(p) for p in perm_s.split(",") if p]
            pack = int(pack_s) if pack_s else 1
            # XLA layout braces list dims MINOR→major (minor_to_major):
            # perm[0] is the lane (minor-most) dim, perm[1] the sublane.
            # Tile T(s,l) lists (sublane, lane); sub-byte packing (p,1)
            # multiplies the sublane granularity (bf16 → 16 rows).
            if len(tile) >= 1 and len(perm) == len(dims):
                tiled_dims = list(reversed(perm[:len(tile)]))
                for i, (ax, t) in enumerate(zip(tiled_dims, tile)):
                    if ax < len(padded) and t > 0:
                        eff = t * (pack if i == 0 and len(tile) > 1 else 1)
                        padded[ax] = -(-padded[ax] // eff) * eff
        n = nbytes
        for d in padded:
            n *= max(1, d)
        total += n
        found = True
    return total if found else None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--steps", type=int, default=3,
                    help="trace_steps the trace covers (per-step divide)")
    ap.add_argument("--roofline", action="store_true",
                    help="per-op achieved HBM bandwidth (bytes_accessed/dur)")
    ap.add_argument("--roofline_filter", default=None,
                    help="substring filter for roofline op names")
    ap.add_argument("--hbm_peak", type=float, default=819.0,
                    help="HBM peak GB/s (v5e: 819)")
    ns = ap.parse_args(argv)

    path = find_trace(ns.logdir)
    print(f"# {path}", file=sys.stderr)
    with gzip.open(path, "rt") as f:
        doc = json.load(f)

    # device-side events: pids whose process name mentions TPU/TensorCore,
    # restricted to the "XLA Ops" thread rows — step/module/TraceMe rows
    # on other tids are HIERARCHY (parents of the op rows) and would
    # double-count every microsecond
    pnames, tnames = {}, {}
    for ev in doc.get("traceEvents", []):
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pnames[ev["pid"]] = ev.get("args", {}).get("name", "")
        elif ev.get("name") == "thread_name":
            tnames[(ev["pid"], ev.get("tid"))] = \
                ev.get("args", {}).get("name", "")
    dev_pids = {pid for pid, n in pnames.items()
                if any(k in n for k in ("TPU", "TensorCore", "/device"))}
    op_tids = {k for k, n in tnames.items()
               if k[0] in dev_pids and "XLA Ops" in n}

    cat = collections.Counter()
    per_op = collections.Counter()
    count = collections.Counter()
    total = 0.0
    for ev in doc.get("traceEvents", []):
        if ev.get("ph") != "X" or (ev.get("pid"), ev.get("tid")) not in op_tids:
            continue
        name = ev.get("name", "")
        dur = float(ev.get("dur", 0.0))
        if dur <= 0:
            continue
        key = classify(name)
        cat[key] += dur
        per_op[name] += dur
        count[name] += 1
        total += dur

    steps = max(1, ns.steps)
    print(f"total device time: {total/1000/steps:.2f} ms/step "
          f"(over {steps} steps)")
    print("\n== by category (ms/step, % of device) ==")
    for key, us in cat.most_common():
        print(f"{us/1000/steps:9.2f}  {100*us/total:5.1f}%  {key}")
    print(f"\n== top {ns.top} ops (ms/step, calls/step) ==")
    for name, us in per_op.most_common(ns.top):
        print(f"{us/1000/steps:9.2f}  {count[name]/steps:6.1f}x  {name[:110]}")

    if ns.roofline:
        # achieved HBM bandwidth per op (bytes_accessed from XProf op
        # metrics) — the counter-proof instrument for "would a hand
        # kernel beat this": an op already at ≥80% of peak BW has no
        # headroom for a Pallas rewrite of the same pass structure.
        rows = []
        seen_bytes = {}
        for ev in doc.get("traceEvents", []):
            if ev.get("ph") != "X" or (ev.get("pid"),
                                       ev.get("tid")) not in op_tids:
                continue
            args = ev.get("args", {})
            by = args.get("bytes_accessed")
            dur = float(ev.get("dur", 0.0))
            if not by or dur <= 0:
                continue
            name = ev.get("name", "")
            if ns.roofline_filter and ns.roofline_filter not in name:
                continue
            phys = _physical_bytes(args.get("long_name", "")) or float(by)
            prev = seen_bytes.get(name, (0.0, 0.0, 0.0))
            seen_bytes[name] = (prev[0] + float(by), prev[1] + dur,
                                prev[2] + float(phys))
        for name, (by, dur, phys) in seen_bytes.items():
            rows.append((dur / 1000 / steps, by / dur / 1e3,
                         phys / dur / 1e3, name))       # GB/s
        rows.sort(reverse=True)
        print(f"\n== roofline (ms/step, logical + PHYSICAL achieved GB/s "
              f"vs {ns.hbm_peak:.0f} peak; physical honors tile padding — "
              f"e.g. a 64-wide minor dim moves 2x its logical bytes) ==")
        for ms, gbps, pgbps, name in rows[:ns.top]:
            print(f"{ms:9.2f}  {gbps:7.0f} log  {pgbps:7.0f} phys "
                  f"{100*pgbps/ns.hbm_peak:5.1f}%  {name[:80]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
