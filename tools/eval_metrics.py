#!/usr/bin/env python
"""Offline generative-metrics evaluation for a saved checkpoint.

The reference has NO evaluation entry point at all — its metric story is
the empty README "Results" stub (`/root/reference/README.md:109-114`) and
`test()` is `pass` (`/root/reference/pggan/model.py:257-258`). This tool
closes the loop the trainer's periodic `fid_cycle` hook opens: evaluate
ANY checkpoint at ANY step offline, without training — e.g. the FINAL
step of a finished run, which the in-run hook never sees when the
schedule ends exactly on a fid_cycle boundary.

    python tools/eval_metrics.py --ckpt_id kceleb256fid2            # latest
    python tools/eval_metrics.py --ckpt_id kceleb256fid2 --ckpt_step 86000 \
        --num_samples 512 --platform cpu

Loads the run's snapshotted config, restores the checkpoint through the
SAME path `train.py --ckpt_id` resumes from (schedule + weights + EMA;
mixed-step pairs refused), then runs `trainer.compute_generative_metrics`
— one feature-extraction pass through the configured extractor
(`fid_extractor`: random_conv | inception, `fid_weights` for published-FID
comparability) over EMA samples vs held-out reals at the checkpoint's
scale. Prints ONE JSON line with fid / kid / kid_std.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="offline FID/KID for a saved checkpoint")
    p.add_argument("--ckpt_id", required=True, help="run id under save_root")
    p.add_argument("--ckpt_step", type=int, default=None,
                   help="checkpoint step (default: the atomic `latest`)")
    p.add_argument("--config", default=None,
                   help="config yaml (default: the run's snapshot, "
                        "<save_root>/<ckpt_id>/config_<ckpt_id>.yaml)")
    p.add_argument("--save_root", default="train_result")
    p.add_argument("--num_samples", type=int, default=None,
                   help="fake-sample count (default: cfg.fid_samples)")
    p.add_argument("--fid_extractor", default=None,
                   choices=["random_conv", "inception"],
                   help="override the run's extractor")
    p.add_argument("--fid_weights", default=None,
                   help="converted InceptionV3 npz for published-FID "
                        "comparability (BASELINE.md 'FID comparability')")
    p.add_argument("--platform", default=None,
                   help="pin the jax platform (e.g. cpu) before any "
                        "backend initializes")
    return p.parse_args(argv)


def main(argv=None):
    ns = parse_args(argv)
    if ns.platform:
        import jax
        jax.config.update("jax_platforms", str(ns.platform))

    from pggan_tpu.config import Config
    from pggan_tpu.registry import create_model

    cfg_path = ns.config or os.path.join(
        ns.save_root, ns.ckpt_id, f"config_{ns.ckpt_id}.yaml")
    if not os.path.exists(cfg_path):
        print(f"config not found: {cfg_path}", file=sys.stderr)
        return 2
    cfg = Config.from_yaml(cfg_path)
    cfg.save_root = ns.save_root
    cfg.run_id = ns.ckpt_id
    cfg.ckpt_id = ns.ckpt_id
    cfg.ckpt_step = ns.ckpt_step
    cfg.use_wandb = False
    if ns.fid_extractor:
        cfg["fid_extractor"] = ns.fid_extractor
    if ns.fid_weights:
        cfg["fid_weights"] = ns.fid_weights

    trainer = create_model(cfg)
    try:
        metrics = trainer.compute_generative_metrics(ns.num_samples)
        extractor = (cfg["fid_extractor"]
                     if "fid_extractor" in cfg else "random_conv")
        record = {
            "ckpt_id": ns.ckpt_id,
            "step": int(trainer.global_step),
            "scale": int(trainer.schedule.scale_index),
            "resolution": int(trainer.schedule.resolution),
            "alpha": float(trainer.schedule.alpha),
            "extractor": str(extractor),
            "num_samples": int(ns.num_samples or cfg.fid_samples),
            "ema": trainer.state.params_G_ema is not None,
        }
        record.update({k: float(v) for k, v in metrics.items()})
        print(json.dumps(record))
    finally:
        trainer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
