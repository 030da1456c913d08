"""Worker for the true multi-process smoke test (test_multihost.py).

Launched as: python tests/multiproc_worker.py RANK NPROC PORT CFG_JSON OUT_JSON

Each process initializes the JAX distributed runtime against a loopback
coordinator with 4 virtual CPU devices (8-device global mesh over 2
processes — the real `jax.distributed.initialize` + cross-process-
collective path, not a monkeypatch stub), runs the trainer for the
configured step budget, and dumps its view of the final step metrics.
The parent asserts the two processes' SPMD metrics agree bit-for-bit —
the multi-process analog of the reference's NCCL rendezvous
(`train.py:89-90`, `lib/utils.py:78-83`).
"""

import json
import os
import sys


def main():
    rank, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, cfg_path, out_path = sys.argv[3], sys.argv[4], sys.argv[5]

    # drop any inherited device-count flag (pytest's conftest exports
    # count=8; the LAST occurrence wins, so appending ours isn't enough)
    inherited = [f for f in os.environ.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
    os.environ["XLA_FLAGS"] = " ".join(
        inherited + ["--xla_force_host_platform_device_count=4"])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=rank)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pggan_tpu.config import Config
    from pggan_tpu.registry import create_model

    with open(cfg_path) as f:
        cfg = Config(json.load(f))
    trainer = create_model(cfg)
    try:
        trainer.fit(f"mp{nproc}", max_step=int(cfg.max_step))
        metrics = {k: float(v) for k, v in trainer._last_metrics.items()}
        record = {"rank": rank,
                  "process_count": jax.process_count(),
                  "global_devices": len(jax.devices()),
                  "step": trainer.global_step,
                  "scale": trainer.schedule.scale_index,
                  "metrics": metrics}
        with open(out_path, "w") as f:
            json.dump(record, f)
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
