#!/usr/bin/env python
"""Failure-detection + auto-resume supervisor for `train.py`.

The reference has no recovery story at all (a crashed `train.py` loses
everything since the last manual restart); this framework's checkpoint
subsystem already makes every run resumable (`--ckpt_id <run>` resumes
from the atomic `latest` alias, SIGTERM checkpoints-then-exits). This tool
closes the loop: it supervises a real training run against the failure
modes actually observed on TPU-service-attached hosts (BASELINE.md round
3: a >4.5 h full device-service outage mid-run; the verify skill's 5-25
min compile-service wedges), so a multi-hour run needs no human babysitter.

    python tools/train_watchdog.py kceleb256fid \
        --config configs/config_demo256_fid.yaml -- --steps_per_dispatch auto

Supervision loop:
  * liveness = `train_result/<run_id>/metrics.jsonl` mtime (the trainer
    appends every loss_cycle). The stall threshold must exceed the
    longest legitimate silent phase — a cold per-scale compile sweep
    (~10 min observed; default 1500 s, `--stall_s`).
  * on stall: SIGTERM the trainer (its handler checkpoints if the device
    still answers), escalate to SIGKILL after `--grace_s` (during a full
    outage the checkpoint write itself would hang — exactly the case the
    periodic `ckpt_cycle` snapshots bound).
  * then probe the device from fresh subprocesses (`timeout`-bounded tiny
    matmul — a wedged service hangs the op, it does not error) every
    `--probe_interval_s`; after 2 consecutive OK probes, relaunch
    `train.py <run_id> --ckpt_id <run_id>` (resume from `latest`).
  * a child that EXITS nonzero without a stall is restarted the same way
    (a startup-phase outage makes train.py die early), up to
    `--max_restarts`; rc=0 means the run completed — the watchdog exits 0.

Kill discipline: exact recorded PIDs only (never pattern matching); the
child PID is also written to `train_result/<run_id>/watchdog_child.pid`
for manual intervention.

The watchdog itself never imports jax (a hung backend would take the
supervisor down with the run); all device contact happens in disposable
subprocesses.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE_SRC = ("import jax, jax.numpy as jnp; "
             "x = jnp.ones((64, 64)); "
             "print('probe_ok', float((x @ x).sum()))")


def log(msg: str):
    print(f"[watchdog {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe_device(timeout_s: float) -> bool:
    """One tiny-matmul probe in a fresh process, hard-bounded by timeout(1).
    Returns True iff the device answered (BASELINE.md outage playbook)."""
    try:
        rc = subprocess.run(
            ["timeout", str(int(timeout_s)), sys.executable, "-c", PROBE_SRC],
            cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ).returncode
        return rc == 0
    except Exception:
        return False


def terminate(proc: subprocess.Popen, grace_s: float):
    """SIGTERM (trainer checkpoints-then-exits if it can), SIGKILL after
    grace. Exact PID only."""
    if proc.poll() is not None:
        return
    log(f"SIGTERM pid {proc.pid}")
    try:
        proc.send_signal(signal.SIGTERM)
    except ProcessLookupError:
        return
    deadline = time.time() + grace_s
    while time.time() < deadline:
        if proc.poll() is not None:
            return
        time.sleep(2.0)
    log(f"SIGKILL pid {proc.pid} (no exit after {grace_s:.0f}s grace)")
    try:
        proc.kill()
    except ProcessLookupError:
        pass
    proc.wait()


def main(argv=None):
    ap = argparse.ArgumentParser(
        usage="train_watchdog.py RUN_ID [options] [-- train.py extra flags]")
    ap.add_argument("run_id")
    ap.add_argument("--config", default="configs.yaml")
    ap.add_argument("--save_root", default="train_result",
                    help="must match the config's save_root (liveness file "
                         "location)")
    ap.add_argument("--stall_s", type=float, default=1500.0,
                    help="metrics.jsonl silence that declares a stall; must "
                         "exceed the longest cold compile sweep")
    ap.add_argument("--grace_s", type=float, default=120.0)
    ap.add_argument("--probe_timeout_s", type=float, default=90.0)
    ap.add_argument("--probe_interval_s", type=float, default=240.0)
    ap.add_argument("--poll_s", type=float, default=30.0)
    ap.add_argument("--max_restarts", type=int, default=20)
    ap.add_argument("--log_file", default=None,
                    help="child stdout/stderr destination "
                         "(default {save_root}/{run_id}/train.log, append)")
    ap.add_argument("--train_cmd", default=None,
                    help="override the trainer command (shlex-split; "
                         "'--ckpt_id RUN_ID' is appended on resume). "
                         "For tests/exotic launchers.")
    ap.add_argument("--probe_cmd", default=None,
                    help="override the device-probe command (shlex-split; "
                         "exit 0 = healthy). Default: timeout-bounded "
                         "tiny-matmul subprocess.")
    ns, extra = ap.parse_known_args(argv)
    if extra and extra[0] == "--":
        extra = extra[1:]

    run_dir = os.path.join(ns.save_root, ns.run_id)
    os.makedirs(run_dir, exist_ok=True)
    liveness = os.path.join(run_dir, "metrics.jsonl")
    pid_file = os.path.join(run_dir, "watchdog_child.pid")
    log_path = ns.log_file or os.path.join(run_dir, "train.log")

    last_launch = time.time()

    def launch(resume: bool) -> subprocess.Popen:
        nonlocal last_launch
        if ns.train_cmd:
            import shlex
            cmd = shlex.split(ns.train_cmd)
        else:
            cmd = [sys.executable, "train.py", ns.run_id,
                   "--config", ns.config]
        if resume:
            cmd += ["--ckpt_id", ns.run_id]      # latest alias
        cmd += list(extra)
        out = open(log_path, "ab", buffering=0)
        proc = subprocess.Popen(cmd, cwd=REPO, stdout=out, stderr=out)
        last_launch = time.time()
        with open(pid_file, "w") as fh:
            fh.write(str(proc.pid))
        log(f"launched pid {proc.pid}: {' '.join(cmd)} (log: {log_path})")
        return proc

    def probe() -> bool:
        if ns.probe_cmd:
            import shlex
            try:
                return subprocess.run(
                    shlex.split(ns.probe_cmd), cwd=REPO,
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                    timeout=ns.probe_timeout_s).returncode == 0
            except Exception:
                return False
        return probe_device(ns.probe_timeout_s)

    def wait_for_device():
        ok_streak = 0
        while ok_streak < 2:
            if probe():
                ok_streak += 1
                log(f"device probe OK ({ok_streak}/2)")
            else:
                ok_streak = 0
                log("device probe failed; waiting "
                    f"{ns.probe_interval_s:.0f}s")
            if ok_streak < 2:
                time.sleep(ns.probe_interval_s)

    restarts = 0
    has_ckpt = lambda: any(
        f.endswith("_latest.npz")
        for f in (os.listdir(os.path.join(run_dir, "ckpt"))
                  if os.path.isdir(os.path.join(run_dir, "ckpt")) else []))
    proc = launch(resume=has_ckpt())
    start = time.time()

    while True:
        time.sleep(ns.poll_s)
        rc = proc.poll()
        if rc is not None:
            if rc == 0:
                log(f"training completed (rc=0) after "
                    f"{(time.time() - start) / 3600:.2f} h")
                return 0
            log(f"trainer exited rc={rc}")
        else:
            # stall age counts from the LATER of the last metrics write and
            # the last (re)launch — a stale pre-restart metrics.jsonl (or a
            # missing one during the startup compile sweep) must not
            # immediately re-trigger the stall on a healthy child
            try:
                basis = max(os.path.getmtime(liveness), last_launch)
            except OSError:
                basis = last_launch
            age = time.time() - basis
            if age < ns.stall_s:
                continue
            log(f"STALL: {liveness} silent for {age:.0f}s "
                f"(> {ns.stall_s:.0f}s)")
            terminate(proc, ns.grace_s)

        restarts += 1
        if restarts > ns.max_restarts:
            log(f"giving up after {ns.max_restarts} restarts")
            return 1
        log(f"waiting for device before restart #{restarts}")
        wait_for_device()
        proc = launch(resume=has_ckpt())

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
