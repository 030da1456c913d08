"""Persistent XLA compilation cache setup.

Per-scale train steps compile once per (scale, batch, config) EVER on a
machine, not once per process: scale jumps and restarts hit the cache
(measured: 60s → ~5s warm start for the 256×256 fused step). Equivalent
role to the reference's md5-keyed CUDA build cache
(`torch_utils/custom_ops.py:93-137`) but for whole XLA programs.
"""

from __future__ import annotations

import os

_done = False


def enable_compilation_cache(cache_dir: str | None = None):
    global _done
    if _done:
        return
    _done = True
    import jax
    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_comp_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Persist EVERYTHING, including sub-second programs: in this
        # environment every compile (CPU included) round-trips a remote
        # compile service whose latency is minutes when congested, so a
        # "trivial" uncached program can stall a process far longer than
        # any local compile would. Disk is cheap; the round trip is not.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        # Make child processes (tests spawn train.py; the trainer spawns
        # nothing, but bench A/B runs are separate processes) share it.
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    except Exception as exc:       # cache is an optimization, never fatal
        print(f"[pggan_tpu] compilation cache disabled ({exc})")
