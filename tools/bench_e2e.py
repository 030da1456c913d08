"""END-TO-END trainer throughput at a fixed scale — dispatch + input
pipeline + step, the rate a real `train.py` run sees (bench.py isolates
the device step; the gap between the two is host/dispatch overhead).

Used to measure the `steps_per_dispatch` chunking win (BASELINE.md
step-chunking table):

    python tools/bench_e2e.py --scale 4 --steps_per_dispatch 1
    python tools/bench_e2e.py --scale 4 --steps_per_dispatch 8

Builds the trainer at the requested scale directly (schedule pinned,
alpha=1, no jumps — steady-state mid-stage conditions), feeds it from the
synthetic dataset (decode-free: isolates dispatch effects from decode
cost; use --data_root for a real folder), and times `train_step` /
`train_chunk` calls exactly as `fit` would issue them, syncing through a
metric fetch (the only reliable barrier on tunneled backends).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=120,
                    help="timed steps (rounded down to whole chunks)")
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--steps_per_dispatch", default="1")
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--loss_mode", default="r1")
    ap.add_argument("--data_root", default=None,
                    help="folder dataset instead of synthetic")
    ap.add_argument("--device_data_cache", default=None,
                    help="'true'|'auto' — HBM-resident dataset "
                         "(data/device_cache.py); requires --data_root")
    ap.add_argument("--platform", default=None)
    ns = ap.parse_args(argv)

    import jax
    if ns.platform:
        jax.config.update("jax_platforms", ns.platform)
    import json

    from pggan_tpu.config import Config
    from pggan_tpu.registry import create_model
    from pggan_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    spd = ("auto" if ns.steps_per_dispatch == "auto"
           else int(ns.steps_per_dispatch))
    from pggan_tpu.config import default_depths
    depths = default_depths(ns.scale)
    cfg = Config({
        "depths": depths,
        "batch_per_gpu": ns.batch,
        "compute_dtype": ns.compute_dtype,
        "loss_mode": ns.loss_mode,
        "steps_per_dispatch": spd,
        "data_backend": "synthetic" if ns.data_root is None else "folder",
        "dataset_root_list": [] if ns.data_root is None else [ns.data_root],
        "synthetic_dataset_size": 256,
        "use_mGPU": True,
        # huge cycles: the timed window must be event-free like a real
        # mid-stage stretch
        "loss_cycle": 10**9, "test_cycle": 10**9, "ckpt_cycle": 10**9,
        "save_root": "/tmp/bench_e2e",
    })
    if ns.device_data_cache is not None:
        cfg["device_data_cache"] = (
            True if ns.device_data_cache == "true" else ns.device_data_cache)
        cfg["device_cache_mb"] = 512
    trainer = create_model(cfg)
    try:
        # pin the schedule mid-stage at the requested scale: alpha=1
        # (fade done), no pending jumps — then rebuild nets/pipeline/step
        # at that scale (the load_checkpoint re-grow path).
        sched = trainer.schedule
        sched.scale_index = ns.scale
        sched.alpha = 1.0
        sched.next_scale_jump_step = 0
        sched.next_alpha_jump_step = 0
        trainer.initialize_models()
        trainer.set_dataset()
        trainer.set_data_iterator()
        trainer._build_step_fn()

        k = trainer._chunk_size if trainer._chunk_fn is not None else 1

        def run_block():
            if k > 1:
                trainer.train_chunk(k)
                return k
            trainer.train_step()
            return 1

        done = 0
        t0 = time.time()
        while done < max(ns.warmup, k):
            done += run_block()
        _ = float(jax.device_get(trainer._last_metrics["L_D"]))
        warm_s = time.time() - t0

        timed = max(ns.steps // k, 1) * k
        done = 0
        t0 = time.time()
        while done < timed:
            done += run_block()
        loss = float(jax.device_get(trainer._last_metrics["L_D"]))
        elapsed = time.time() - t0
        assert loss == loss, "non-finite loss"

        res = 2 ** (ns.scale + 2)
        print(json.dumps({
            "metric": f"END-TO-END images/sec, {res}x{res} trainer loop "
                      f"(dispatch+pipeline+step, {ns.loss_mode}, "
                      f"{ns.compute_dtype})",
            "value": round(done * trainer.local_batch_size / elapsed, 1),
            "unit": "images/sec",
            "steps_per_dispatch": k,
            "step_ms": round(1000 * elapsed / done, 2),
            "warmup_s": round(warm_s, 1),
            "device_data_cache": trainer._device_cache is not None,
        }))
    finally:
        trainer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
