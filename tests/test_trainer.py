"""End-to-end trainer tests: full progressive runs, checkpoint resume,
image/metric output, CLI surface."""

import json
import os

import numpy as np
import pytest

from pggan_tpu import Config
from pggan_tpu.registry import create_model


def smoke_cfg(tmp_path, **over):
    return Config({
        "depths": [16, 16, 8],
        "latent_dim": 32,
        "batch_per_gpu": 1,            # 8 devices × 1 = global 8
        "max_step_at_scale": [4, 6, 6],
        "alpha_jump_start": [-1, 1, 1],
        "alpha_jump_interval": [0, 1, 1],
        "alpha_jump_Ntimes": [0, 3, 3],
        "loss_cycle": 2,
        "test_cycle": 4,
        "ckpt_cycle": 4,
        "save_root": str(tmp_path / "results"),
        "data_backend": "synthetic",
        "synthetic_dataset_size": 64,
        "num_data_workers": 2,
        "use_mGPU": True,
        **over,
    })


class TestEndToEnd:
    def test_progressive_run_with_jumps(self, tmp_path):
        cfg = smoke_cfg(tmp_path)
        trainer = create_model(cfg)
        try:
            trainer.fit("smoke", max_step=12)
            # scale jumps at steps 4 and 10 → scale 2, res 16; the scale-2
            # alpha fade starts at 11, so one of three jumps has fired.
            assert trainer.schedule.scale_index == 2
            assert trainer.schedule.resolution == 16
            assert trainer.schedule.alpha == 0.3333
            run_dir = os.path.join(cfg.save_root, "smoke")
            assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
            assert os.path.exists(os.path.join(run_dir, "imgs", "e4.jpg"))
            ckpts = os.listdir(os.path.join(run_dir, "ckpt"))
            assert "G_latest.npz" in ckpts and "D_latest.npz" in ckpts
        finally:
            trainer.close()

    def test_metrics_jsonl_valid(self, tmp_path):
        cfg = smoke_cfg(tmp_path)
        trainer = create_model(cfg)
        try:
            trainer.fit("m", max_step=4)
        finally:
            trainer.close()
        lines = open(os.path.join(cfg.save_root, "m", "metrics.jsonl")).readlines()
        assert lines
        rec = json.loads(lines[0])
        assert "L_D" in rec and "L_G" in rec and np.isfinite(rec["L_D"])


class TestBatchSchedule:
    def test_batch_switches_at_scale_jump(self, tmp_path):
        """`batch_schedule` overrides the global batch per scale index
        (BASELINE config #5 semantics: shrink at high res to fit HBM —
        `global_batch_size`, parallel/mesh.py). The switch happens at the
        scale jump: new pipeline batch, new step program, finite losses."""
        cfg = smoke_cfg(tmp_path, batch_schedule={1: 16})
        trainer = create_model(cfg)
        try:
            assert trainer.local_batch_size == 8       # 8 dev × 1
            trainer.fit("bs", max_step=6)              # jump at 4 → scale 1
            assert trainer.schedule.scale_index == 1
            assert trainer.local_batch_size == 16
            assert trainer._pipeline.batch_size == 16
        finally:
            trainer.close()
        records = [json.loads(l) for l in open(
            os.path.join(cfg.save_root, "bs", "metrics.jsonl"))]
        stepped = [r for r in records if "L_D" in r]
        assert stepped and all(np.isfinite(r["L_D"]) for r in stepped)


class TestValidation:
    def test_use_validation_logs_metric(self, tmp_path):
        cfg = smoke_cfg(tmp_path, use_validation=True, test_cycle=2)
        trainer = create_model(cfg)
        try:
            trainer.fit("val_run", max_step=3)
        finally:
            trainer.close()
        records = [json.loads(l) for l in open(
            os.path.join(cfg.save_root, "val_run", "metrics.jsonl"))]
        assert any("valid_D_real" in r for r in records)   # legacy alias

    def test_validation_evaluates_fake_side_and_losses(self, tmp_path):
        """validation() must be a real evaluation (the capability
        `pggan/model.py:260-261` stubs out): multi-batch, BOTH D sides
        (real and generated) plus adversarial losses, as val_* metrics."""
        cfg = smoke_cfg(tmp_path, use_validation=True, test_cycle=2,
                        val_batches=2)
        trainer = create_model(cfg)
        try:
            trainer.fit("val_fake", max_step=3)
        finally:
            trainer.close()
        records = [json.loads(l) for l in open(
            os.path.join(cfg.save_root, "val_fake", "metrics.jsonl"))]
        val = [r for r in records if "val_D_fake" in r]
        assert val, "no fake-side validation metrics logged"
        for key in ("val_D_real", "val_D_fake", "val_L_D", "val_L_G"):
            assert all(np.isfinite(r[key]) for r in val)
        # BCE losses on logits are strictly positive; identically-zero
        # values would mean the eval never ran the nets
        assert all(r["val_L_D"] > 0 and r["val_L_G"] > 0 for r in val)


    def test_validation_fades_reals_like_training(self, tmp_path):
        """During a fade, training feeds D alpha-blended reals
        (step.py real fade-in, pggan/model.py:217-221); validation must
        evaluate on the SAME distribution or val_L_D diverges from the
        held-out analog of L_D for reasons unrelated to fit."""
        import jax.numpy as jnp
        from pggan_tpu.models import discriminator_apply
        from pggan_tpu.ops import downscale2d, upscale2d

        cfg = smoke_cfg(tmp_path, use_validation=True, test_cycle=2)
        trainer = create_model(cfg)
        try:
            trainer.fit("val_fade", max_step=6)     # scale 1 (jump at 4)
            assert trainer.schedule.scale_index == 1
            trainer.validation(6)                   # builds _val_fn
            rs = np.random.RandomState(0)
            real = jnp.asarray(rs.uniform(-1, 1, (8, 8, 8, 3)), jnp.float32)
            z = jnp.zeros((8, 32), jnp.float32)
            alpha = jnp.float32(0.5)
            got = trainer._val_fn(trainer.state.params_G,
                                  trainer.state.params_D, real, z, alpha)
            faded = 0.5 * upscale2d(downscale2d(real, 2), 2) + 0.5 * real
            want = discriminator_apply(
                trainer.state.params_D, faded, alpha,
                slope=float(cfg.LReLU_slope),
                apply_minibatch_norm=bool(cfg.apply_minibatch_norm),
                compute_dtype=jnp.bfloat16)
            unfaded = discriminator_apply(
                trainer.state.params_D, real, alpha,
                slope=float(cfg.LReLU_slope),
                apply_minibatch_norm=bool(cfg.apply_minibatch_norm),
                compute_dtype=jnp.bfloat16)
            want_f = float(jnp.mean(want.astype(jnp.float32)))
            want_u = float(jnp.mean(unfaded.astype(jnp.float32)))
            # rtol tolerates bf16 jit-vs-eager rounding (~1e-3 observed);
            # the faded/unfaded separation is ~300x larger
            np.testing.assert_allclose(float(got[0]), want_f, rtol=5e-3)
            assert abs(float(got[0]) - want_f) < abs(float(got[0]) - want_u)
        finally:
            trainer.close()

    def test_validation_survives_scale_jump(self, tmp_path):
        # Regression: the validation pipeline must be rebuilt when a scale
        # jump changes the dataset resolution — a stale pipeline feeds
        # old-resolution batches into the grown D and crashes.
        cfg = smoke_cfg(tmp_path, use_validation=True, test_cycle=2)
        trainer = create_model(cfg)
        try:
            trainer.fit("val_jump", max_step=8)    # scale jump at step 4
            assert trainer.schedule.scale_index == 1
        finally:
            trainer.close()
        records = [json.loads(l) for l in open(
            os.path.join(cfg.save_root, "val_jump", "metrics.jsonl"))]
        steps_with_valid = [r["step"] for r in records if "valid_D_real" in r]
        assert any(s >= 4 for s in steps_with_valid)   # post-jump eval ran


class TestFIDHook:
    def test_compute_fid_runs(self, tmp_path):
        cfg = smoke_cfg(tmp_path)
        trainer = create_model(cfg)
        try:
            trainer.fit("fid_run", max_step=3)
            fid = trainer.compute_fid(num_samples=16)
            assert np.isfinite(fid) and fid >= 0
        finally:
            trainer.close()

    def test_metric_reals_used_at_most_once(self, tmp_path):
        """When the real pool is smaller than fid_samples, each unique
        real must appear at most once in the metric features: resampling
        with replacement biased KID's within-real kernel sum (duplicate
        rows are identical off-diagonal pairs) and collapsed its subset
        error bar to 0."""
        cfg = smoke_cfg(tmp_path, synthetic_dataset_size=40)
        trainer = create_model(cfg)
        try:
            trainer.fit("kid_run", max_step=3)
            # valid split of 40 → 12 reals, >= the batch floor of 8 (so
            # the valid split is used) and < the 48 requested samples
            n_reals = len(trainer._valid_indices)
            assert 8 <= n_reals < 48
            from pggan_tpu.metrics import compute_activations
            captured = {}
            orig = compute_activations

            def spy(batches, extractor, **kw):
                f = orig(batches, extractor, **kw)
                captured.setdefault("sizes", []).append(f.shape[0])
                return f

            import pggan_tpu.train.trainer as trainer_mod
            import pggan_tpu.metrics as metrics_mod
            old = metrics_mod.compute_activations
            metrics_mod.compute_activations = spy
            try:
                m = trainer.compute_generative_metrics(num_samples=48)
            finally:
                metrics_mod.compute_activations = old
            # first extraction pass is the reals: exactly the unique pool
            assert captured["sizes"][0] == n_reals
            assert captured["sizes"][1] == 48          # fakes at full n
            # unequal sides → subset resampling is live again
            assert np.isfinite(m["kid"]) and m["kid_std"] > 0
        finally:
            trainer.close()

    def test_packed_eval_paths_match_unpacked(self, tmp_path):
        """At hires_pack scales the FID sampler, validation() and demo.py
        route through the PACKED program (round-4: the unpacked eval
        forward at ≥512² was a second per-scale compile through exactly
        the layout-copy pathology packing avoids). Packed execution is a
        pure representation change, so every eval output must agree with
        the unpacked program on identical weights."""
        common = dict(use_validation=True, val_batches=2,
                      compute_dtype="float32", fid_samples=16)
        cfg_u = smoke_cfg(tmp_path, hires_pack=0, **common)
        cfg_p = smoke_cfg(tmp_path, hires_pack=1, **common)
        t_u = create_model(cfg_u)
        t_p = create_model(cfg_p)
        try:
            t_u.fit("ev_u", max_step=6)        # scale jump at 4 → scale 1
            t_p.fit("ev_p", max_step=6)
            assert t_u.schedule.scale_index == 1
            assert t_p.schedule.scale_index == 1
            t_p.state = t_u.state              # identical weights both sides

            m_u = t_u.compute_generative_metrics(num_samples=16)
            m_p = t_p.compute_generative_metrics(num_samples=16)
            assert t_p._fid_sampler_packed and not t_u._fid_sampler_packed
            np.testing.assert_allclose(m_p["fid"], m_u["fid"],
                                       rtol=1e-3, atol=1e-5)
            np.testing.assert_allclose(m_p["kid"], m_u["kid"],
                                       rtol=1e-3, atol=1e-6)

            t_u.validation(6)
            t_p.validation(6)
        finally:
            t_u.close()
            t_p.close()
        val = {}
        for run in ("ev_u", "ev_p"):
            records = [json.loads(l) for l in open(
                os.path.join(cfg_u.save_root, run, "metrics.jsonl"))]
            val[run] = [r for r in records if "val_L_D" in r][-1]
        for key in ("val_D_real", "val_D_fake", "val_L_D", "val_L_G"):
            np.testing.assert_allclose(val["ev_p"][key], val["ev_u"][key],
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=key)

        # demo.py on the packed run's checkpoint: resolves hires_pack from
        # the ckpt meta, samples packed, and the host unpack restores the
        # FULL resolution
        import demo as demo_cli
        rc = demo_cli.main(["--ckpt_id", "ev_p", "--save_root",
                            cfg_p.save_root, "--n_samples", "2"])
        assert rc == 0
        from PIL import Image
        img = Image.open(os.path.join(cfg_p.save_root, "ev_p", "samples",
                                      "result_0.jpg"))
        assert img.size == (8, 8)              # scale 1 → 8×8, not 4×4×12

    def test_fid_cycle_logs_metric(self, tmp_path):
        cfg = smoke_cfg(tmp_path, fid_cycle=2, fid_samples=16)
        trainer = create_model(cfg)
        try:
            trainer.fit("fid_log", max_step=3)
        finally:
            trainer.close()
        records = [json.loads(l) for l in open(
            os.path.join(cfg.save_root, "fid_log", "metrics.jsonl"))]
        fid_records = [r for r in records if "fid" in r]
        assert fid_records
        # KID rides the same extraction pass (unbiased at small n —
        # metrics/kid.py); both land in the same JSONL record
        assert all("kid" in r and np.isfinite(r["kid"]) for r in fid_records)


class TestResume:
    def test_resume_restores_schedule_and_weights(self, tmp_path):
        cfg = smoke_cfg(tmp_path)
        trainer = create_model(cfg)
        try:
            trainer.fit("orig", max_step=8)       # past the scale jump at 4
            snap_sched = trainer.schedule.state_dict()
            w = np.asarray(trainer.state.params_G["first_conv"]["w"])
        finally:
            trainer.close()

        cfg2 = smoke_cfg(tmp_path, ckpt_id="orig", ckpt_step=8)
        trainer2 = create_model(cfg2)
        try:
            assert trainer2.global_step == 8
            assert trainer2.schedule.state_dict() == snap_sched
            assert trainer2.schedule.scale_index == 1
            np.testing.assert_array_equal(
                np.asarray(trainer2.state.params_G["first_conv"]["w"]), w)
            # and training continues across the next jump
            trainer2.cfg.run_id = "resumed"
            trainer2.fit("resumed", max_step=12)
            assert trainer2.global_step == 12
        finally:
            trainer2.close()

    def test_resume_restores_schedule_lists_from_snapshot(self, tmp_path):
        """The per-scale schedule LISTS (max_step_at_scale, alpha_jump_*)
        must come from the checkpoint snapshot when the resume config does
        not explicitly set them — the schedule is rebuilt post-restore, so
        future jumps/fades use the original run's durations."""
        cfg = smoke_cfg(tmp_path, max_step_at_scale=[7, 9, 9],
                        alpha_jump_start=[-1, 3, 3])
        trainer = create_model(cfg)
        try:
            trainer.fit("sched", max_step=2)
        finally:
            trainer.close()

        # minimal resume config: schedule lists NOT explicitly set →
        # package defaults, which the snapshot must override
        cfg2 = Config({"save_root": str(tmp_path / "results"),
                       "ckpt_id": "sched", "use_mGPU": True})
        trainer2 = create_model(cfg2)
        try:
            assert list(trainer2.schedule.max_step_at_scale) == [7, 9, 9]
            assert list(trainer2.schedule.alpha_jump_start) == [-1, 3, 3]
            assert trainer2.schedule.next_scale_jump_step == 7
            # the fit total uses the restored budget too
            assert list(trainer2.cfg.max_step_at_scale) == [7, 9, 9]
        finally:
            trainer2.close()

    def test_yaml_default_values_defer_to_snapshot(self, tmp_path):
        """Provenance tiers (`lib/model_loader.py:26-31` parity): a yaml
        key whose value EQUALS the package default is not user intent —
        train.py always loads `--config configs.yaml`, so if every yaml
        key counted as explicit, resume would silently re-apply the
        current yaml's whole schedule/lr/loss_mode over the snapshot.
        Only yaml keys that DIFFER from defaults (plus CLI flags) win."""
        import yaml as yaml_lib
        cfg = smoke_cfg(tmp_path, max_step_at_scale=[7, 9, 9], lr_G=3e-4)
        trainer = create_model(cfg)
        try:
            trainer.fit("prov", max_step=2)
        finally:
            trainer.close()

        # a resume yaml carrying (a) default values for the snapshot-
        # overridden keys and (b) one genuinely changed key
        resume_yaml = tmp_path / "resume.yaml"
        resume_yaml.write_text(yaml_lib.safe_dump({
            "save_root": str(tmp_path / "results"),   # differs → explicit
            "use_mGPU": True,                          # differs → explicit
            "ckpt_id": "prov",
            "max_step_at_scale":                      # EQUALS default →
                Config().max_step_at_scale,           # snapshot must win
            "lr_G": 1e-4,                              # equals default
            "lr_D": 7e-5,                              # differs → explicit
        }))
        cfg2 = Config.from_yaml(str(resume_yaml))
        assert "max_step_at_scale" not in cfg2.explicit_keys()
        assert "lr_D" in cfg2.explicit_keys()
        trainer2 = create_model(cfg2)
        try:
            # snapshot wins where the resume yaml only restated defaults
            assert list(trainer2.cfg.max_step_at_scale) == [7, 9, 9]
            assert trainer2.cfg.lr_G == pytest.approx(3e-4)
            # explicit (non-default) yaml keys still override the snapshot
            assert trainer2.cfg.lr_D == pytest.approx(7e-5)
        finally:
            trainer2.close()

    def test_resume_restores_rng_stream(self, tmp_path):
        # The post-step RNG key is checkpointed so a resumed run continues
        # the SAME latent/eps stream instead of replaying from the seed.
        cfg = smoke_cfg(tmp_path)
        trainer = create_model(cfg)
        try:
            trainer.fit("rngrun", max_step=4)
            rng_after = np.asarray(trainer.state.rng)
        finally:
            trainer.close()
        cfg2 = smoke_cfg(tmp_path, ckpt_id="rngrun", ckpt_step=4)
        trainer2 = create_model(cfg2)
        try:
            np.testing.assert_array_equal(np.asarray(trainer2.state.rng),
                                          rng_after)
            # a fresh (non-resumed) trainer would have started from the seed
            fresh = create_model(smoke_cfg(tmp_path / "fresh"))
            try:
                assert not np.array_equal(np.asarray(fresh.state.rng),
                                          rng_after)
            finally:
                fresh.close()
        finally:
            trainer2.close()

    def test_resume_latest_when_step_none(self, tmp_path):
        cfg = smoke_cfg(tmp_path)
        trainer = create_model(cfg)
        try:
            trainer.fit("orig2", max_step=5)
        finally:
            trainer.close()
        cfg2 = smoke_cfg(tmp_path, ckpt_id="orig2", ckpt_step=None)
        trainer2 = create_model(cfg2)
        try:
            assert trainer2.global_step == 5      # final save at fit() end
        finally:
            trainer2.close()

    def test_missing_ckpt_fails_loudly(self, tmp_path):
        cfg = smoke_cfg(tmp_path, ckpt_id="ghost")
        with pytest.raises(FileNotFoundError):
            create_model(cfg)


class TestCLI:
    def test_train_cli_smoke(self, tmp_path, monkeypatch, capsys):
        import train as train_cli
        cfg_path = tmp_path / "cfg.yaml"
        import yaml
        smoke = smoke_cfg(tmp_path).to_dict()
        cfg_path.write_text(yaml.safe_dump(smoke))
        monkeypatch.chdir(tmp_path)
        rc = train_cli.main(["cli_run", "--config", str(cfg_path),
                             "--max_step", "3"])
        assert rc == 0
        assert os.path.exists(os.path.join(smoke["save_root"], "cli_run",
                                           "metrics.jsonl"))

    def test_demo_cli_samples(self, tmp_path, monkeypatch):
        cfg = smoke_cfg(tmp_path)
        trainer = create_model(cfg)
        try:
            trainer.fit("demo_src", max_step=5)
        finally:
            trainer.close()
        import demo as demo_cli
        rc = demo_cli.main(["--ckpt_id", "demo_src",
                            "--save_root", cfg.save_root,
                            "--n_samples", "3"])
        assert rc == 0
        samples = os.listdir(os.path.join(cfg.save_root, "demo_src", "samples"))
        assert sorted(samples) == ["result_0.jpg", "result_1.jpg", "result_2.jpg"]

    def test_train_cli_requires_run_id(self, capsys):
        import train as train_cli
        assert train_cli.main(["--max_step", "1"]) == 2

    def test_eval_metrics_cli(self, tmp_path, capsys):
        """tools/eval_metrics.py: offline FID/KID for a saved checkpoint
        through the resume load path — one JSON line with finite values
        at the checkpoint's restored step/scale."""
        cfg = smoke_cfg(tmp_path, fid_samples=8)
        trainer = create_model(cfg)
        try:
            trainer.fit("eval_src", max_step=5)    # ckpt written at step 4
        finally:
            trainer.close()

        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "eval_metrics",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "eval_metrics.py"))
        tool = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(tool)
        import yaml
        cfg_path = tmp_path / "eval_cfg.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg.to_dict()))
        rc = tool.main(["--ckpt_id", "eval_src",
                        "--save_root", cfg.save_root,
                        "--config", str(cfg_path),
                        "--num_samples", "8"])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # fit() checkpoints once more on exit → `latest` is the final step
        assert rec["ckpt_id"] == "eval_src" and rec["step"] == 5
        # the run crossed the step-4 scale jump before its exit checkpoint
        assert rec["scale"] == 1 and rec["resolution"] == 8
        assert rec["extractor"] == "random_conv"
        for key in ("fid", "kid", "kid_std"):
            assert np.isfinite(rec[key])

    def test_collect_evidence_cli(self, tmp_path):
        """tools/collect_evidence.py: the durable-evidence collector must
        capture metrics.jsonl + analyze_run digests + the final sample
        grid for a finished run, without importing jax itself."""
        cfg = smoke_cfg(tmp_path)
        trainer = create_model(cfg)
        try:
            trainer.fit("evd", max_step=5)         # grid written at step 4
        finally:
            trainer.close()

        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "collect_evidence",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "collect_evidence.py"))
        tool = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(tool)
        out_root = str(tmp_path / "evidence")
        rc = tool.main(["evd", "--save_root", cfg.save_root,
                        "--out", out_root])
        assert rc == 0
        out_dir = os.path.join(out_root, "evd")
        files = set(os.listdir(out_dir))
        assert {"metrics.jsonl", "analyze_run.json", "analyze_run.txt",
                "final_grid.jpg"} <= files
        digest = json.loads(open(
            os.path.join(out_dir, "analyze_run.json")).read())
        assert digest["run"] == "evd" and digest["last_step"] >= 4
        # the copied stream is byte-identical to the run's
        src = open(os.path.join(cfg.save_root, "evd",
                                "metrics.jsonl")).read()
        assert open(os.path.join(out_dir, "metrics.jsonl")).read() == src
