#!/usr/bin/env python
"""Layout-pinning probes for the 1024² residual copy pool (round-3
VERDICT item 6: attack the remaining layout-transition copies with
`jax.experimental.layout`, or log exactly which pinning was tried and
what the trace said).

Each invocation runs ONE variant in ONE process (two same-signature /
different-HLO programs in one process wedge this environment's remote
compile service — verify skill), measures steady-state step time, traces
`--trace_steps` steps, and prints one JSON line:

    {"variant": ..., "m2m": ..., "ms_per_step": ..., "img_s": ...,
     "copy_ms": ..., "device_ms": ...}

Variants (all at the packed-execution scale-8 step unless overridden):
  baseline      the production step, no pinning
  img_entry     with_layout_constraint on the raw uint8 image operand
  packed_imgs   constraint on space_to_depth2's output (the packed
                image every top-level consumer reads)
  conv_in       constraint on every packed conv's input activation
  params_entry  constraint on every 4-D parameter leaf at step entry

`--m2m` gives the major→minor order to pin for rank-4 tensors
(default "3,2,1,0" = row-major; "0,3,2,1" puts batch minor-most, etc.).

Usage (separate processes per variant — A/B via the shell, never in one):
    python tools/probe_layout.py --variant baseline
    python tools/probe_layout.py --variant conv_in --m2m 3,2,1,0
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import collections
import glob
import gzip
import json
import time

import numpy as np


def copy_ms_from_trace(logdir, steps):
    """(copy/transpose ms/step, total device ms/step) from the newest
    XProf trace under logdir — trace_ops.py's accounting, inlined for a
    one-line summary."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from trace_ops import classify, find_trace
    with gzip.open(find_trace(logdir), "rt") as f:
        doc = json.load(f)
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
    total = 0.0
    for ev in doc.get("traceEvents", []):
        if ev.get("ph") != "X" or (ev.get("pid"), ev.get("tid")) not in op_tids:
            continue
        dur = float(ev.get("dur", 0.0))
        if dur <= 0:
            continue
        cat[classify(ev.get("name", ""))] += dur
        total += dur
    return (cat.get("copy/transpose", 0.0) / 1000.0 / steps,
            total / 1000.0 / steps)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="baseline",
                    choices=["baseline", "img_entry", "img_entry_jit",
                             "packed_imgs", "conv_in", "params_entry"])
    ap.add_argument("--m2m", default="3,2,1,0",
                    help="major_to_minor for rank-4 pins")
    ap.add_argument("--scale", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--trace_steps", type=int, default=3)
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu for smoke tests; "
                         "env JAX_PLATFORMS is latched over at startup in "
                         "this environment — see verify skill)")
    ns = ap.parse_args(argv)
    logdir = ns.logdir or f"/tmp/xprof_layout_{ns.variant}"

    import jax
    if ns.platform:
        jax.config.update("jax_platforms", ns.platform)
    import jax.numpy as jnp
    from jax.experimental.layout import Layout, with_layout_constraint

    from pggan_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from pggan_tpu.config import Config, default_depths
    from pggan_tpu.models import (init_discriminator_params,
                                  init_generator_params)
    from pggan_tpu.parallel import create_mesh, replicate, shard_batch
    from pggan_tpu.train.step import (init_train_state, make_optimizers,
                                      make_train_step)

    m2m = tuple(int(t) for t in ns.m2m.split(","))

    def pin4(x):
        if getattr(x, "ndim", 0) == 4:
            # jax 0.9: with_layout_constraint takes a bare Layout (a Format
            # wrapper requires a concrete sharding and is rejected here).
            return with_layout_constraint(x, Layout(m2m))
        return x

    # -- variant hooks (monkeypatch the packed ops: every consumer imports
    #    them function-locally, so the patch is seen at trace time) -------
    import pggan_tpu.ops.packed as packed_mod
    if ns.variant == "packed_imgs":
        orig_s2d = packed_mod.space_to_depth2
        packed_mod.space_to_depth2 = lambda x: pin4(orig_s2d(x))
    elif ns.variant == "conv_in":
        orig_conv = packed_mod.packed_equalized_conv2d
        packed_mod.packed_equalized_conv2d = \
            lambda p, x, **kw: orig_conv(p, pin4(x), **kw)

    depths = default_depths(ns.scale)
    res = 2 ** (ns.scale + 2)
    cfg = Config({"depths": depths, "latent_dim": 512,
                  "compute_dtype": "bfloat16", "donate_buffers": True,
                  "hires_pack": "auto", "remat": "auto"})
    opt_g, opt_d = make_optimizers(cfg)

    @jax.jit
    def _init(rng):
        kg, kd, ks = jax.random.split(rng, 3)
        pG = init_generator_params(kg, latent_dim=512, depths=depths,
                                   scale=ns.scale)
        pD = init_discriminator_params(kd, depths=depths, scale=ns.scale)
        return init_train_state(ks, pG, pD, opt_g, opt_d)

    state = _init(jax.random.PRNGKey(0))
    jax.block_until_ready(state)
    mesh = create_mesh(devices=jax.devices())
    state = replicate(state, mesh)
    imgs = shard_batch(np.random.RandomState(0).randint(
        0, 256, (ns.batch, res, res, 3), dtype=np.uint8), mesh)
    alpha = jnp.float32(0.7)

    base = make_train_step(cfg, ns.scale, opt_g, opt_d, jit=False)
    if ns.variant == "img_entry":
        def body(st, im, a):
            return base(st, pin4(im), a)
    elif ns.variant == "params_entry":
        def body(st, im, a):
            st = st._replace(params_G=jax.tree.map(pin4, st.params_G),
                             params_D=jax.tree.map(pin4, st.params_D))
            return base(st, im, a)
    else:
        body = base
    if ns.variant == "img_entry_jit":
        # TRUE entry-layout pin at the jit boundary (jax 0.9 accepts a
        # concrete Format in in_shardings without banned-here AOT
        # .lower().compile()): the runtime lays the uint8 image operand out
        # as requested BEFORE the program starts, instead of a constraint
        # inside the traced body.
        from jax.experimental.layout import Format
        img_fmt = Format(Layout(m2m), imgs.sharding)
        # jit's in_shardings Format is a CONTRACT, not a conversion — the
        # operand must already carry the pinned layout (device_put writes
        # it during the host->device transfer, exactly the path a pipeline
        # would use in production if this wins).
        imgs = jax.device_put(imgs, img_fmt)
        step = jax.jit(body, in_shardings=(None, img_fmt, None),
                       donate_argnums=(0,))
    else:
        step = jax.jit(body, donate_argnums=(0,))

    t0 = time.time()
    for _ in range(3):
        state, metrics, _ = step(state, imgs, alpha)
    print(f"warmup+compile {time.time()-t0:.1f}s "
          f"L_D {float(jax.device_get(metrics['L_D'])):.4f}",
          file=sys.stderr)

    t0 = time.time()
    for _ in range(ns.steps):
        state, metrics, _ = step(state, imgs, alpha)
    _ = float(jax.device_get(metrics["L_D"]))
    dt = (time.time() - t0) / ns.steps

    with jax.profiler.trace(logdir):
        for _ in range(ns.trace_steps):
            state, metrics, _ = step(state, imgs, alpha)
        _ = float(jax.device_get(metrics["L_D"]))
    copy_ms, device_ms = copy_ms_from_trace(logdir, ns.trace_steps)

    print(json.dumps({
        "variant": ns.variant, "m2m": ns.m2m, "scale": ns.scale,
        "batch": ns.batch, "ms_per_step": round(dt * 1000, 1),
        "img_s": round(ns.batch / dt, 2), "copy_ms": round(copy_ms, 1),
        "device_ms": round(device_ms, 1), "logdir": logdir,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
