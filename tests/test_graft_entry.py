"""Driver-facing entry points: __graft_entry__.entry + dryrun_multichip.

The driver invokes `dryrun_multichip(8)` from an environment that may show
only ONE real device (the axon TPU tunnel); the function must then
self-provision a virtual 8-device CPU mesh in a subprocess. These tests
exercise both the direct path (this test process already has 8 virtual
devices, conftest.py) and the self-provisioning path (a subprocess that
sees a single CPU device).
"""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as g
        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape[0] == args[1].shape[0]

    def test_dryrun_direct_path(self):
        # conftest gives this process 8 virtual CPU devices → direct body.
        import __graft_entry__ as g
        g.dryrun_multichip(8)

    def test_dryrun_self_provisions_from_one_device(self):
        # Mimic the driver's seat: a process with a single visible device
        # calls dryrun_multichip(8); it must re-exec onto a virtual CPU
        # mesh and succeed.
        from tests.conftest import require_live_jax_subprocess
        require_live_jax_subprocess()
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)           # outer process: 1 CPU device
        env["JAX_PLATFORMS"] = "cpu"         # never touch the real TPU here
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "assert len(jax.devices()) == 1, jax.devices(); "
            "import __graft_entry__ as g; g.dryrun_multichip(8)"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code], env=env, cwd=REPO,
            capture_output=True, text=True, timeout=600)
        assert proc.returncode == 0, f"stderr:\n{proc.stderr[-2000:]}"
        assert "dryrun_multichip(8): ok" in proc.stdout
