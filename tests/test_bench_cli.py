"""Smoke tests for bench.py — the driver-facing benchmark entry.

The driver runs `python bench.py` at the end of every round and records
the single JSON line; these tests pin that contract in-process on the
8-virtual-device CPU mesh (conftest): valid JSON fields, finite value,
and the round-5 default recipe (lazy R1/16 via r1-leading windows,
BASELINE.md round-5) vs the `--r1_interval 1` reference-parity program.
"""

import json

def _run_bench(capsys, argv):
    import bench
    rc = bench.main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    return json.loads(out[-1])


def test_bench_default_is_lazy_r1_window_recipe(capsys):
    rec = _run_bench(capsys, [
        "--scale", "1", "--batch_per_chip", "2", "--steps", "16",
        "--warmup", "2", "--device_timeout", "0"])
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    # default recipe is the convergence-proven lazy cadence, and the
    # JSON line says so (the multiplier is only quotable WITH the
    # evidence pointer)
    assert "lazy-R1/16" in rec["metric"]
    assert "lazyr1_convergence" in rec["recipe"]
    # CPU run: MFU must be suppressed, not fabricated
    assert rec["mfu"] is None


def test_bench_parity_interval_one(capsys):
    rec = _run_bench(capsys, [
        "--scale", "1", "--batch_per_chip", "2", "--steps", "4",
        "--warmup", "1", "--device_timeout", "0", "--r1_interval", "1"])
    assert rec["value"] > 0
    assert "lazy" not in rec["metric"]
    assert "recipe" not in rec
