"""Failure-recovery tests: SIGTERM checkpoint-then-exit and exact resume."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_cfg(tmp_path, **over):
    cfg = {
        "model_id": "pggan",
        "use_mGPU": False,
        "dataset_root_list": [],
        "save_root": str(tmp_path / "results"),
        "depths": [16, 16, 8],
        "latent_dim": 32,
        "batch_per_gpu": 8,
        "max_step_at_scale": [30, 40, 40],
        "alpha_jump_start": [-1, 5, 5],
        "alpha_jump_interval": [0, 2, 2],
        "alpha_jump_Ntimes": [0, 5, 5],
        "loss_cycle": 5,
        "test_cycle": 1000,
        "ckpt_cycle": 1000,
        "data_backend": "synthetic",
        "synthetic_dataset_size": 64,
        "num_data_workers": 2,
        # REQUIRED for subprocess tests: the env var JAX_PLATFORMS=cpu is
        # latched over at interpreter startup on this image, so without
        # this key the spawned trainer initializes the real TPU backend
        # (slow remote compiles, device contention, hangs during service
        # outages). train.py applies it via jax.config.update early.
        "jax_platforms": "cpu",
        **over,
    }
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path), cfg


def run_train(args, log_path, *, timeout=900, sigterm_after=None):
    # Child output goes to a FILE, never a PIPE: an un-drained pipe fills
    # (64 KiB) and blocks the child mid-print — cold compiles on this
    # image emit multi-KB loader warnings per program, which deadlocked
    # the old PIPE version against the metrics.jsonl readiness poll.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"   # belt; the cfg's jax_platforms is what works
    with open(log_path, "w") as log:
        proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "train.py"), *args],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT)
        if sigterm_after is not None:
            time.sleep(sigterm_after)
            proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=timeout)
    with open(log_path) as f:
        return proc.returncode, f.read()


class TestPreemption:
    def test_sigterm_checkpoints_and_resumes(self, tmp_path):
        from tests.conftest import require_live_jax_subprocess
        require_live_jax_subprocess()
        # unbounded-ish budget so the run can't finish before the signal.
        # Readiness is DETERMINISTIC: poll for a non-empty metrics.jsonl
        # (the trainer writes + flushes it at step 0, after the signal
        # handlers are installed) — never parse the child's stdout live,
        # whose block-buffering made the old readline approach flaky.
        cfg_path, cfg = write_cfg(tmp_path, max_step_at_scale=[5000, 5000])
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        # file-backed output: see run_train for why PIPE deadlocks here
        log_path = str(tmp_path / "pre.log")
        log = open(log_path, "w")
        proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "train.py"), "pre",
             "--config", cfg_path, "--max_step", "5000"],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT)

        def child_out():
            if not log.closed:
                log.flush()
            with open(log_path) as f:
                return f.read()
        # Deadlines are sized for the WORST cold-compile case: this
        # environment's remote compile service can take minutes per cold
        # program when congested (see conftest.py) — a short deadline here
        # turns service latency into a spurious red suite.
        metrics_path = os.path.join(cfg["save_root"], "pre", "metrics.jsonl")
        deadline = time.time() + 900
        while time.time() < deadline:
            if proc.poll() is not None:
                break                    # died early — surface output below
            if os.path.exists(metrics_path) and os.path.getsize(metrics_path):
                break
            time.sleep(0.25)
        assert proc.poll() is None, child_out()
        if not (os.path.exists(metrics_path) and os.path.getsize(metrics_path)):
            proc.kill()
            proc.wait(timeout=60)
            raise AssertionError(
                "training loop never went live within 900s:\n"
                + child_out()[-2000:])
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=240)
        log.close()
        out = child_out()
        rc = proc.returncode
        assert rc == 0, out
        assert "interrupted" in out, out

        ckpt_dir = os.path.join(cfg["save_root"], "pre", "ckpt")
        files = os.listdir(ckpt_dir)
        assert "G_latest.npz" in files and "D_latest.npz" in files

        # what step did we stop at?
        from pggan_tpu.utils.checkpoint import load_checkpoint
        _, _, meta = load_checkpoint(cfg["save_root"], "pre", "G", None)
        stopped = meta["global_step"]
        assert 0 < stopped < 5000, f"stopped at {stopped}"

        # resume to completion
        rc, out = run_train(["pre2", "--config", cfg_path,
                             "--ckpt_id", "pre", "--max_step", str(stopped + 5)],
                            str(tmp_path / "pre2.log"))
        assert rc == 0, out
        _, _, meta2 = load_checkpoint(cfg["save_root"], "pre2", "G", None)
        assert meta2["global_step"] == stopped + 5
        # schedule state carried over
        assert meta2["schedule"]["scale_index"] >= meta["schedule"]["scale_index"]


class TestPreemptionReplay:
    def test_resume_continues_metrics_bit_exact(self, tmp_path):
        """The real preemption story, pinned (round-3 VERDICT item 7 —
        the path the marquee kceleb1024fid SIGTERM-stop exercised
        manually): train a packed-scale config with chunked dispatch,
        SIGTERM mid-second-stage, resume with --ckpt_id into the SAME
        run, and require the post-resume metrics stream to be BIT-EXACT
        against an uninterrupted reference run. This only holds because
        resume restores the full replay state: params/opt (checkpoint),
        the latent RNG key (meta['rng']), and the data-stream position
        (DataPipeline start_batch fast-forward)."""
        from tests.conftest import require_live_jax_subprocess
        require_live_jax_subprocess()
        cfg_path, cfg = write_cfg(
            tmp_path,
            hires_pack=1,                 # packed top level from scale 1 on
            steps_per_dispatch=4,         # chunked dispatch throughout
            batch_per_gpu=8,
            max_step_at_scale=[40, 200, 200],
            alpha_jump_start=[-1, 8, 8],
            alpha_jump_interval=[0, 4, 4],
            alpha_jump_Ntimes=[0, 5, 5],
            loss_cycle=4,
        )

        def read_metrics(run):
            path = os.path.join(cfg["save_root"], run, "metrics.jsonl")
            recs = [json.loads(l) for l in open(path)]
            # deterministic loss keys only (time/imgs_per_sec are wall-clock)
            keys = ("L_D", "L_G", "L_D_real", "L_D_fake", "L_D_r1")
            return {r["step"]: {k: r[k] for k in keys if k in r}
                    for r in recs if "L_D" in r}

        # 1. uninterrupted reference run to step 120 (mid scale-1 stage)
        rc, out = run_train(["ref", "--config", cfg_path,
                             "--max_step", "120"],
                            str(tmp_path / "ref.log"))
        assert rc == 0, out

        # 2. same recipe, SIGTERM once it is past step 60 (mid scale-1,
        #    inside the packed stage, between chunk dispatches)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        log_path = str(tmp_path / "rep.log")
        metrics_path = os.path.join(cfg["save_root"], "rep", "metrics.jsonl")
        with open(log_path, "w") as log:
            proc = subprocess.Popen(
                [sys.executable, os.path.join(REPO, "train.py"), "rep",
                 "--config", cfg_path, "--max_step", "120"],
                cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT)
            deadline = time.time() + 900
            while time.time() < deadline:
                if proc.poll() is not None:
                    break
                if os.path.exists(metrics_path) and any(
                        json.loads(l).get("step", 0) >= 60
                        for l in open(metrics_path) if l.strip()):
                    break
                time.sleep(0.25)
            assert proc.poll() is None, open(log_path).read()
            proc.send_signal(signal.SIGTERM)
            proc.wait(timeout=240)
        assert proc.returncode == 0, open(log_path).read()

        from pggan_tpu.utils.checkpoint import load_checkpoint
        _, _, meta = load_checkpoint(cfg["save_root"], "rep", "G", None)
        stopped = meta["global_step"]
        assert 40 < stopped < 120, f"stopped at {stopped} — not mid-stage"

        # 3. resume the SAME run_id to 120 (appends to its metrics.jsonl)
        rc, out = run_train(["rep", "--config", cfg_path,
                             "--ckpt_id", "rep", "--max_step", "120"],
                            str(tmp_path / "rep2.log"))
        assert rc == 0, out

        ref, rep = read_metrics("ref"), read_metrics("rep")
        post = [s for s in sorted(rep) if s > stopped]
        assert len(post) >= 2, (stopped, sorted(rep))
        for s in post:
            assert s in ref, f"step {s} missing from reference stream"
            assert rep[s] == ref[s], (
                f"post-resume metrics diverged at step {s} "
                f"(stopped at {stopped}): {rep[s]} != {ref[s]}")


class TestResumeAtJumpBoundary:
    def test_checkpoint_saved_exactly_at_jump_step(self, tmp_path):
        # save at the exact step where next_scale_jump fires on resume:
        # the restored trainer must grow on its first check_jump.
        from pggan_tpu import Config
        from pggan_tpu.registry import create_model

        cfg = Config({
            "depths": [16, 16, 8], "latent_dim": 32, "batch_per_gpu": 1,
            "max_step_at_scale": [6, 8, 8],
            "alpha_jump_start": [-1, 2, 2],
            "alpha_jump_interval": [0, 1, 1],
            "alpha_jump_Ntimes": [0, 3, 3],
            "loss_cycle": 100, "test_cycle": 1000, "ckpt_cycle": 1000,
            "save_root": str(tmp_path / "r"), "data_backend": "synthetic",
            "synthetic_dataset_size": 32, "num_data_workers": 1,
            "use_mGPU": True,
        })
        trainer = create_model(cfg)
        try:
            trainer.fit("jump", max_step=6)       # stops AT the jump step
            assert trainer.schedule.scale_index == 0
            assert trainer.schedule.next_scale_jump_step == 6
        finally:
            trainer.close()

        cfg2 = Config({**cfg.to_dict(), "ckpt_id": "jump"})
        trainer2 = create_model(cfg2)
        try:
            assert trainer2.global_step == 6
            assert trainer2.schedule.scale_index == 0     # not yet grown
            trainer2.fit("jump2", max_step=8)
            assert trainer2.schedule.scale_index == 1     # grew at step 6
            assert trainer2.schedule.resolution == 8
        finally:
            trainer2.close()


class TestLazyEdgeCases:
    def test_lazy_r1_batch_not_divisible_by_4(self):
        import jax
        import jax.numpy as jnp
        from pggan_tpu import Config
        from pggan_tpu.models import (init_generator_params,
                                      init_discriminator_params)
        from pggan_tpu.train.step import (init_train_state, make_optimizers,
                                          make_train_step)
        cfg = Config({"depths": [16, 16], "latent_dim": 32,
                      "r1_interval": 4, "donate_buffers": False})
        kg, kd, ks = jax.random.split(jax.random.PRNGKey(0), 3)
        pG = init_generator_params(kg, latent_dim=32, depths=cfg.depths)
        pD = init_discriminator_params(kd, depths=cfg.depths)
        og, od = make_optimizers(cfg)
        st = init_train_state(ks, pG, pD, og, od)
        fn = make_train_step(cfg, 0, og, od)
        img = jnp.asarray(np.random.RandomState(0).randint(
            0, 256, (6, 4, 4, 3), dtype=np.uint8))      # B=6: no fusing
        st, m_on, _ = fn(st, img, jnp.float32(0.0), True)
        st, m_off, _ = fn(st, img, jnp.float32(0.0), False)
        assert np.isfinite(float(m_on["L_D"]))
        assert float(m_off["L_D_r1"]) == 0.0
