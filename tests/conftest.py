"""Test environment: force CPU with 8 virtual devices.

This is the TPU analog of "test multi-node without a cluster": the
multi-chip sharding paths compile and execute on a virtual 8-device CPU
mesh (SURVEY.md §4 implication (d)).

NOTE: this image pre-imports jax at interpreter startup (sitecustomize)
with JAX_PLATFORMS=axon latched, so setting os.environ here is too late
for the platform choice — use jax.config.update instead, which takes
effect as long as no backend has been initialized yet. XLA_FLAGS is read
lazily at CPU-client creation, so the env var still works for the
virtual-device count.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache for the whole suite (and for train.py
# subprocesses, which inherit JAX_COMPILATION_CACHE_DIR): compiles in this
# environment round-trip a remote compile service — minutes of latency for
# a cold program under load — so repeat runs must be cache-warm.
from pggan_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

assert jax.default_backend() == "cpu", (
    "tests must run on CPU; got " + jax.default_backend())
assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()}")

_subprocess_jax_live = None


def require_live_jax_subprocess(timeout=240):
    """Skip (not fail) subprocess-spawning tests during a remote-service
    outage. This environment's jax startup talks to a remote service even
    on the CPU platform; during an outage (observed >1 h, round 3) a
    freshly-spawned interpreter hangs in a startup retry loop BEFORE
    running any test code, so subprocess tests would fail their deadlines
    with no code bug. Probe once per session: a child that can't finish
    `1+1` on CPU within `timeout` means the service is down.
    """
    global _subprocess_jax_live
    if _subprocess_jax_live is None:
        import subprocess
        import sys
        import pytest  # noqa: F401  (imported for symmetry with callers)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.config.update('jax_platforms', 'cpu'); "
                 "import jax.numpy as jnp; print(float(jnp.asarray(1.) + 1))"],
                env=env, timeout=timeout, capture_output=True)
            _subprocess_jax_live = proc.returncode == 0
        except subprocess.TimeoutExpired:
            _subprocess_jax_live = False
    if not _subprocess_jax_live:
        import pytest
        pytest.skip("jax subprocess startup unresponsive — remote-service "
                    "outage (see verify skill); not a code failure")
