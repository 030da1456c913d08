#!/usr/bin/env python
"""Train entry point.

API parity with the reference `train.py` plus the README's documented flag
surface (the reference README documents --run_id/--ckpt_id/--ckpt_step/
--use_mGPU/--use_wandb but the code only reads sys.argv[1],
`train.py:81`). Both forms work here:

    python train.py my_run                      # positional run_id
    python train.py --run_id my_run --use_mGPU  # flag form
    python train.py my_run --config configs.yaml --max_step 1000

No torch.multiprocessing.spawn: one process drives every device SPMD via
the jitted step over a `jax.sharding.Mesh`; `--use_mGPU` simply widens the
mesh to every visible device. Multi-host runs call
`jax.distributed.initialize()` first (JAX_COORDINATOR_ADDR env).
"""

from __future__ import annotations

import argparse
import os
import sys

from pggan_tpu.config import Config
from pggan_tpu.registry import create_model


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="pggan_tpu trainer")
    parser.add_argument("run_id_pos", nargs="?", default=None,
                        help="run id (positional, reference-compatible)")
    parser.add_argument("--run_id", default=None)
    parser.add_argument("--config", default="configs.yaml")
    parser.add_argument("--ckpt_id", default=None)
    parser.add_argument("--ckpt_step", default=None, type=int)
    parser.add_argument("--use_mGPU", action="store_true", default=None)
    parser.add_argument("--no_mGPU", dest="use_mGPU", action="store_false")
    parser.add_argument("--use_wandb", action="store_true", default=None)
    parser.add_argument("--max_step", type=int, default=None)
    parser.add_argument("--loss_mode", choices=["r1", "wgangp"], default=None)
    parser.add_argument("--data_backend",
                        choices=["auto", "folder", "synthetic"], default=None)
    parser.add_argument("--compute_dtype",
                        choices=["float32", "bfloat16"], default=None)
    parser.add_argument("--steps_per_dispatch", default=None,
                        help="fused steps per dispatched program in "
                             "event-free schedule windows (int or 'auto'; "
                             "1 = per-step dispatch). Amortizes the "
                             "host→device round trip at small scales.")
    parser.add_argument("--platform", default=None,
                        help="pin the jax platform (e.g. cpu). NOTE: on this"
                             " image the JAX_PLATFORMS env var is latched at"
                             " interpreter startup, so env vars cannot select"
                             " the platform for a spawned train.py — this"
                             " flag (or a jax_platforms config key) applies"
                             " jax.config.update before any backend"
                             " initializes, which does work.")
    return parser.parse_args(argv)


def main(argv=None):
    ns = parse_args(argv)
    if os.path.exists(ns.config):
        cfg = Config.from_yaml(ns.config)
    else:
        cfg = Config()

    run_id = ns.run_id or ns.run_id_pos
    if run_id is None:
        print("usage: python train.py {run_id} [--flags]", file=sys.stderr)
        return 2
    cfg.run_id = run_id
    if ns.steps_per_dispatch is not None:
        cfg["steps_per_dispatch"] = (
            "auto" if ns.steps_per_dispatch == "auto"
            else int(ns.steps_per_dispatch))
    for key in ("ckpt_id", "ckpt_step", "use_mGPU", "use_wandb", "max_step",
                "loss_mode", "data_backend", "compute_dtype"):
        value = getattr(ns, key)
        if value is not None:
            cfg[key] = value

    # Pin the platform BEFORE anything initializes a jax backend (the
    # trainer's first jax.process_index() would otherwise initialize the
    # highest-priority platform — on this image "axon", the real TPU —
    # even for test subprocesses that exported JAX_PLATFORMS=cpu).
    platform = ns.platform or (
        cfg["jax_platforms"] if "jax_platforms" in cfg else None)
    if platform:
        import jax
        jax.config.update("jax_platforms", str(platform))

    # multi-host initialization when a coordinator is configured
    if os.environ.get("JAX_COORDINATOR_ADDR"):
        import jax
        jax.distributed.initialize()

    cfg.save_yaml(ns.config)         # snapshot config into the run dir
    trainer = create_model(cfg)
    try:
        trainer.fit(run_id, max_step=ns.max_step)
    finally:
        trainer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
