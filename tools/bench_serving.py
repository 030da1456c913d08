#!/usr/bin/env python
"""Serving-path benchmark: generator sampling throughput per scale.

The training bench (`bench.py`) measures the fused D+G train step; this
measures the DEPLOYMENT path a user of the reference's `demo.py` cares
about — latents in, images out — in two modes:

  * `direct`:   `jax.jit(generator_apply)` with resident params (the
                demo.py / trainer-eval path).
  * `artifact`: the self-contained StableHLO serving artifact produced by
                `pggan_tpu.export.export_generator` (weights baked in,
                no framework code at serve time) — the mode proves the
                exported graph costs nothing over the direct path.

Reference role: `demo.py:23-68` (the sampling loop this accelerates);
the reference publishes no sampling throughput either (README.md:22-24).

Two throughput numbers per run:
  * device img/s — programs enqueued back-to-back, one end-of-queue sync
    (what the chip sustains; batch-pipelined serving approaches this);
  * e2e img/s — each batch fetched to host uint8 before the next dispatch
    (single-request latency path; on this environment's tunneled TPU it
    is dominated by the ~30 ms dispatch round-trip + image transfer).

One JSON line per invocation. `--all` runs every scale in its own
subprocess (one compiled program per process, the same hygiene as
tools/bench_table.py) and emits a markdown table on stderr.

Usage:
    python tools/bench_serving.py --scale 6                # one row
    python tools/bench_serving.py --scale 6 --mode artifact
    python tools/bench_serving.py --all --out serving.json
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def run_one(ns):
    import jax
    if ns.platform:
        # this image latches JAX_PLATFORMS=axon at interpreter startup
        # (sitecustomize pre-import), so env vars are too late — see
        # tests/conftest.py
        jax.config.update("jax_platforms", ns.platform)
    import jax.numpy as jnp

    from pggan_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from pggan_tpu.models import generator_apply, init_generator_params

    from pggan_tpu.config import default_depths
    depths = default_depths(ns.scale)
    res = 2 ** (ns.scale + 2)
    dtype = jnp.bfloat16 if ns.compute_dtype == "bfloat16" else jnp.float32

    params = init_generator_params(
        jax.random.PRNGKey(0), latent_dim=512, depths=depths, scale=ns.scale)

    def fwd(z):
        return generator_apply(params, z, jnp.float32(1.0),
                               compute_dtype=dtype,
                               fused_scale=ns.fused_scale,
                               hires_pack=ns.hires_pack)

    t0 = time.time()
    if ns.mode == "artifact":
        from pggan_tpu.export import export_generator, load_exported
        # batch pinned: a symbolic-batch artifact serves any batch, but a
        # pinned one lets this bench also report artifact size/compile for
        # the exact served shape.
        blob = export_generator(
            params, latent_dim=512, alpha=1.0, batch=ns.batch,
            compute_dtype=dtype, fused_scale=ns.fused_scale,
            hires_pack=ns.hires_pack)
        exported = load_exported(blob)
        sample = jax.jit(exported.call)
        artifact_mb = len(blob) / 1e6
    else:
        sample = jax.jit(fwd)
        artifact_mb = None
    build_s = time.time() - t0

    rng = np.random.RandomState(0)
    zs = [jnp.asarray(rng.randn(ns.batch, 512), jnp.float32)
          for _ in range(max(ns.steps, ns.warmup))]

    # warmup/compile (sync via host transfer of a scalar — NOT
    # block_until_ready; see CLAUDE.md tunnel landmine)
    t0 = time.time()
    out = sample(zs[0])
    _ = float(jax.device_get(jnp.mean(out.astype(jnp.float32))))
    compile_s = time.time() - t0
    for i in range(1, ns.warmup):
        out = sample(zs[i % len(zs)])
    _ = float(jax.device_get(jnp.mean(out.astype(jnp.float32))))

    # device throughput: enqueue back-to-back, sync once at the end (the
    # TPU executes enqueued programs in order, so a host transfer derived
    # from the last output drains the whole queue)
    t0 = time.time()
    for i in range(ns.steps):
        out = sample(zs[i % len(zs)])
    _ = float(jax.device_get(jnp.mean(out.astype(jnp.float32))))
    device_s = time.time() - t0
    device_img_s = ns.batch * ns.steps / device_s

    # end-to-end: fetch each batch to host uint8 before the next dispatch
    # (demo.py's actual loop, demo.py:99-115)
    n_e2e = max(4, min(ns.steps, int(2.0 * device_img_s / ns.batch) or 4))
    t0 = time.time()
    for i in range(n_e2e):
        imgs = np.asarray(sample(zs[i % len(zs)]))
        imgs = (np.clip(imgs.astype(np.float32) * 0.5 + 0.5, 0, 1)
                * 255).astype(np.uint8)
    e2e_s = time.time() - t0
    e2e_img_s = ns.batch * n_e2e / e2e_s
    assert imgs.shape == (ns.batch, res, res, 3)

    import jax as _jax
    dev = _jax.devices()[0]
    row = {
        "metric": f"serving images/sec, {res}x{res} generator sampling "
                  f"({ns.mode}, {ns.compute_dtype})",
        "value": round(device_img_s, 1),
        "unit": "images/sec/chip",
        "e2e_img_s": round(e2e_img_s, 1),
        "batch": ns.batch,
        "scale": ns.scale,
        "mode": ns.mode,
        "compile_s": round(compile_s, 1),
        "artifact_mb": round(artifact_mb, 1) if artifact_mb else None,
        "build_s": round(build_s, 1),
        "platform": dev.platform,
    }
    print(json.dumps(row))
    return 0


def run_all(ns):
    rows = []
    for scale in ns.scales:
        batch = {7: 8, 8: 4}.get(scale, ns.batch)
        for mode in (["direct", "artifact"] if scale == 6 else ["direct"]):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--scale", str(scale), "--batch", str(batch),
                   "--steps", str(ns.steps), "--mode", mode,
                   "--warmup", str(ns.warmup),
                   "--compute_dtype", ns.compute_dtype,
                   "--fused_scale", str(ns.fused_scale),
                   "--hires_pack", str(ns.hires_pack)]
            if ns.platform:
                cmd += ["--platform", ns.platform]
            print(f"[serving] scale {scale} ({2**(scale+2)}px) {mode} "
                  f"batch {batch} ...", file=sys.stderr)
            proc = subprocess.run(cmd, cwd=REPO, capture_output=True,
                                  text=True, timeout=3600)
            if proc.returncode != 0:
                rows.append({"scale": scale, "mode": mode,
                             "error": proc.stderr[-800:]})
                print("[serving]   -> ERROR", file=sys.stderr)
                continue
            row = json.loads(proc.stdout.strip().splitlines()[-1])
            rows.append(row)
            print(f"[serving]   -> {row['value']} img/s (e2e "
                  f"{row['e2e_img_s']})", file=sys.stderr)

    doc = {"rows": rows}
    print(json.dumps(doc, indent=1))
    if ns.out:
        with open(ns.out, "w") as f:
            json.dump(doc, f, indent=1)
    print("\n| Scale | Res | mode | batch | device img/s | e2e img/s |",
          file=sys.stderr)
    print("|---|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        if "error" in r:
            print(f"| {r['scale']} | {2**(r['scale']+2)} | {r['mode']} "
                  f"| | ERROR | |", file=sys.stderr)
            continue
        print(f"| {r['scale']} | {2**(r['scale']+2)} | {r['mode']} | "
              f"{r['batch']} | **{r['value']}** | {r['e2e_img_s']} |",
              file=sys.stderr)
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=6)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--mode", default="direct",
                    choices=["direct", "artifact"])
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--fused_scale", default="dilated")
    ap.add_argument("--hires_pack", type=int, default=0,
                    help="packed top levels (train-path default is auto; "
                         "forward-only sampling has no grad-of-grad copy "
                         "pathology, so 0 is the serving default)")
    ap.add_argument("--all", action="store_true",
                    help="run every scale in its own subprocess")
    ap.add_argument("--scales", type=int, nargs="*",
                    default=[2, 3, 4, 5, 6, 7, 8])
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default=None,
                    help="override jax platform (e.g. cpu for smoke tests)")
    ns = ap.parse_args(argv)
    return run_all(ns) if ns.all else run_one(ns)


if __name__ == "__main__":
    raise SystemExit(main())
