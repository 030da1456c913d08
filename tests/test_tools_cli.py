"""CLI tests for the pure-file analysis tools.

`tools/compare_runs.py` is the convergence-evidence oracle for the
lazy-R1 equal-quality claim (BASELINE.md round-5): stage-minimum FID
deltas between two runs that differ only in `r1_interval`. It is pure
file I/O (no jax), so these tests pin its contract cheaply: stage
bounding from --stages and from the run's config snapshot, minima
placement, delta signs, and throughput medians.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_run(tmp_path, name, fid_by_step, rates=(100.0, 200.0, 300.0),
               max_step_at_scale=(10, 10)):
    d = tmp_path / name
    d.mkdir()
    with open(d / "metrics.jsonl", "w") as f:
        for i, r in enumerate(rates):
            f.write(json.dumps({"step": i, "imgs_per_sec": r}) + "\n")
        for step, fid in fid_by_step.items():
            f.write(json.dumps({"step": step, "fid": fid}) + "\n")
    with open(d / f"config_{name}.yaml", "w") as f:
        f.write("max_step_at_scale: [%s]\n"
                % ", ".join(str(n) for n in max_step_at_scale))
    return d


def _run(args):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "compare_runs.py"),
         *args, "--json"],
        capture_output=True, text=True, cwd=REPO)
    assert out.returncode == 0, out.stderr
    return json.loads(out.stdout)


def test_compare_runs_stage_minima_and_deltas(tmp_path):
    a = _write_run(tmp_path, "a", {2: 50.0, 5: 30.0, 12: 20.0, 19: 25.0})
    b = _write_run(tmp_path, "b", {2: 40.0, 5: 45.0, 12: 10.0, 19: 99.0})
    doc = _run([str(a), str(b), "--stages", "10,20"])

    # minima land in the right stages ([0,10) and [10,21) — the final
    # stage is widened by one so a run ending exactly on the boundary
    # keeps its last eval point)
    assert doc["a"]["stage_minima"][0]["min_fid"] == 30.0
    assert doc["a"]["stage_minima"][0]["at_step"] == 5
    assert doc["a"]["stage_minima"][1]["min_fid"] == 20.0
    assert doc["b"]["stage_minima"][0]["min_fid"] == 40.0
    assert doc["b"]["stage_minima"][1]["min_fid"] == 10.0

    # deltas: b - a, with relative change
    d0, d1 = doc["stage_min_deltas"]
    assert d0["delta"] == 10.0 and d0["rel"] == round(10.0 / 30.0, 4)
    assert d1["delta"] == -10.0

    # throughput median over the imgs_per_sec rows
    assert doc["a"]["throughput"] == {"median_img_s": 200.0, "n": 3}


def test_compare_runs_infers_stages_from_config_snapshot(tmp_path):
    a = _write_run(tmp_path, "a", {5: 11.0, 15: 7.0},
                   max_step_at_scale=(10, 10))
    b = _write_run(tmp_path, "b", {5: 12.0, 15: 8.0},
                   max_step_at_scale=(10, 10))
    doc = _run([str(a), str(b)])
    stages = [m["stage"] for m in doc["a"]["stage_minima"]]
    assert stages == ["[0,10)", "[10,21)"]
    assert doc["stage_min_deltas"][0]["a"] == 11.0


def test_compare_runs_handles_run_without_fid(tmp_path):
    a = _write_run(tmp_path, "a", {5: 11.0})
    b = _write_run(tmp_path, "b", {})
    doc = _run([str(a), str(b), "--stages", "10"])
    assert doc["b"]["stage_minima"][0]["min_fid"] is None
    assert doc["stage_min_deltas"] == []
