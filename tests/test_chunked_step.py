"""Step chunking (`steps_per_dispatch`): k fused iterations per dispatched
program via an in-graph `lax.scan` loop.

The contract is STEP-EXACTNESS: a chunked run must evolve state exactly as
the same steps dispatched one by one (same RNG stream, same batches, same
alpha — chunks only exist inside event-free schedule windows), and every
host-visible side effect (loss logs, sample grids, checkpoints, schedule
transitions) must still happen at exactly its reference step
(`train.py:39-66` semantics unchanged).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pggan_tpu import Config
from pggan_tpu.models import init_discriminator_params, init_generator_params
from pggan_tpu.registry import create_model
from pggan_tpu.train.step import (
    init_train_state,
    make_chunked_train_step,
    make_optimizers,
    make_train_step,
    resolve_steps_per_dispatch,
)

DEPTHS = [16, 16, 8]
LATENT = 32


def _cfg(**over):
    return Config({
        "depths": DEPTHS, "latent_dim": LATENT,
        "loss_cycle": 1000, "test_cycle": 1000, "ckpt_cycle": 1000,
        **over,
    })


def _state(cfg, scale, opt_g, opt_d, *, ema=False, seed=0):
    kg, kd, ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    params_G = init_generator_params(
        kg, latent_dim=LATENT, depths=DEPTHS, scale=scale)
    params_D = init_discriminator_params(kd, depths=DEPTHS, scale=scale)
    return init_train_state(ks, params_G, params_D, opt_g, opt_d, ema=ema)


def _copy(tree):
    return jax.tree.map(jnp.copy, tree)


class TestChunkedEquivalence:
    @pytest.mark.parametrize("loss_mode", ["r1", "wgangp"])
    def test_chunk_matches_sequential_steps(self, loss_mode):
        cfg = _cfg(loss_mode=loss_mode)
        opt_g, opt_d = make_optimizers(cfg)
        scale, k, alpha = 1, 3, 0.4
        state = _state(cfg, scale, opt_g, opt_d)
        rng = np.random.default_rng(2)
        batches = [rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
                   for _ in range(k)]

        step = make_train_step(cfg, scale, opt_g, opt_d)
        seq = _copy(state)
        for b in batches:
            seq, metrics_seq, images_seq = step(seq, b, jnp.float32(alpha))

        chunked = make_chunked_train_step(cfg, scale, opt_g, opt_d, k)
        out, metrics_chunk, images_chunk = chunked(
            _copy(state), [jnp.asarray(b) for b in batches],
            jnp.float32(alpha))

        for a, b in zip(jax.tree.leaves(seq), jax.tree.leaves(out)):
            np.testing.assert_allclose(np.asarray(a, np.float64),
                                       np.asarray(b, np.float64),
                                       rtol=1e-5, atol=1e-6)
        # last-step metrics and sample images match the sequential run
        np.testing.assert_allclose(float(metrics_seq["L_D"]),
                                   float(metrics_chunk["L_D"]), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(images_seq[1]),
                                   np.asarray(images_chunk[1]),
                                   rtol=1e-4, atol=1e-5)

    def test_chunk_matches_with_ema(self):
        cfg = _cfg(g_ema_decay=0.9)
        opt_g, opt_d = make_optimizers(cfg)
        state = _state(cfg, 0, opt_g, opt_d, ema=True)
        rng = np.random.default_rng(3)
        batches = [rng.integers(0, 256, (4, 4, 4, 3), dtype=np.uint8)
                   for _ in range(2)]
        step = make_train_step(cfg, 0, opt_g, opt_d)
        seq = _copy(state)
        for b in batches:
            seq, _, _ = step(seq, b, jnp.float32(1.0))
        chunked = make_chunked_train_step(cfg, 0, opt_g, opt_d, 2)
        out, _, _ = chunked(_copy(state),
                            [jnp.asarray(b) for b in batches],
                            jnp.float32(1.0))
        for a, b in zip(jax.tree.leaves(seq.params_G_ema),
                        jax.tree.leaves(out.params_G_ema)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_rejects_lazy_r1(self):
        cfg = _cfg(r1_interval=4)
        opt_g, opt_d = make_optimizers(cfg)
        with pytest.raises(ValueError, match="r1_interval"):
            make_chunked_train_step(cfg, 0, opt_g, opt_d, 4)

    def test_rejects_degenerate_chunk(self):
        cfg = _cfg()
        opt_g, opt_d = make_optimizers(cfg)
        with pytest.raises(ValueError, match="n_steps"):
            make_chunked_train_step(cfg, 0, opt_g, opt_d, 1)


class TestResolvePolicy:
    def test_explicit_int_and_off(self):
        assert resolve_steps_per_dispatch(_cfg(steps_per_dispatch=6), 2) == 6
        assert resolve_steps_per_dispatch(_cfg(steps_per_dispatch=1), 2) == 1

    def test_auto_is_resolution_gated(self):
        cfg = _cfg(steps_per_dispatch="auto")
        assert resolve_steps_per_dispatch(cfg, 2) == 8     # 16²
        assert resolve_steps_per_dispatch(cfg, 5) == 8     # 128²
        assert resolve_steps_per_dispatch(cfg, 6) == 1     # 256²

    def test_rejects_nonpositive(self):
        with pytest.raises(ValueError):
            resolve_steps_per_dispatch(_cfg(steps_per_dispatch=0), 2)

    def test_trainer_rejects_explicit_chunk_with_lazy_r1(self, tmp_path):
        # an EXPLICIT steps_per_dispatch > 1 with lazy R1 must raise (the
        # trainer used to drop it silently while the direct
        # make_chunked_train_step API raised for the same combination);
        # 'auto' degrades to per-step dispatch without error
        from pggan_tpu import Config
        from pggan_tpu.registry import create_model
        base = dict(depths=[16, 16], latent_dim=32, batch_per_gpu=1,
                    save_root=str(tmp_path / "r"),
                    data_backend="synthetic", synthetic_dataset_size=8,
                    num_data_workers=0, use_mGPU=True,
                    loss_mode="r1", r1_interval=4)
        with pytest.raises(ValueError, match="r1_interval"):
            create_model(Config(dict(base, steps_per_dispatch=4)))
        tr = create_model(Config(dict(base, steps_per_dispatch="auto")))
        try:
            assert tr._chunk_fn is None and tr._chunk_size == 1
        finally:
            tr.close()


def _smoke_cfg(tmp_path, **over):
    return Config({
        "depths": DEPTHS, "latent_dim": LATENT,
        "batch_per_gpu": 1,            # 8 devices × 1 = global 8
        "max_step_at_scale": [8, 12, 12],
        "alpha_jump_start": [-1, 2, 2],
        "alpha_jump_interval": [0, 2, 2],
        "alpha_jump_Ntimes": [0, 2, 2],
        "loss_cycle": 8,
        "test_cycle": 16,
        "ckpt_cycle": 16,
        "save_root": str(tmp_path / "results"),
        "data_backend": "synthetic",
        "synthetic_dataset_size": 64,
        "num_data_workers": 2,
        "use_mGPU": True,
        "seed": 7,
        **over,
    })


class TestTrainerIntegration:
    def test_fit_with_chunking_matches_unchunked(self, tmp_path):
        """A full progressive fit (scale jumps, fades, logging cycles)
        with steps_per_dispatch=4 must produce the same final parameters
        and the same metrics.jsonl step set as per-step dispatch — chunks
        are pure state evolution between host actions."""
        finals = {}
        for tag, spd in (("plain", 1), ("chunked", 4)):
            cfg = _smoke_cfg(tmp_path, steps_per_dispatch=spd)
            trainer = create_model(cfg)
            try:
                trainer.fit(tag, max_step=20)
                finals[tag] = (
                    jax.device_get(trainer.state.params_G),
                    jax.device_get(trainer.state.params_D),
                    trainer.schedule.state_dict(),
                    trainer._chunks_dispatched,
                )
            finally:
                trainer.close()
        (pg_a, pd_a, sched_a, chunks_a) = finals["plain"]
        (pg_b, pd_b, sched_b, chunks_b) = finals["chunked"]
        assert chunks_a == 0 and chunks_b > 0
        assert sched_a == sched_b
        for a, b in zip(jax.tree.leaves((pg_a, pd_a)),
                        jax.tree.leaves((pg_b, pd_b))):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

        # host-visible logging cadence unchanged: same logged steps
        steps = {}
        for tag in ("plain", "chunked"):
            path = os.path.join(str(tmp_path / "results"), tag,
                                "metrics.jsonl")
            steps[tag] = [json.loads(l)["step"] for l in open(path)]
        assert steps["plain"] == steps["chunked"]

    def test_chunk_window_excludes_events(self, tmp_path):
        cfg = _smoke_cfg(tmp_path, steps_per_dispatch=4)
        trainer = create_model(cfg)
        try:
            trainer._build_step_fn()
            total = 1000
            # loss_cycle=8: window starting at 1 fits [1..4]; a window
            # containing step 8 (log) or the scale jump at 8 must refuse
            assert trainer._chunk_window(1, total) == 4
            assert trainer._chunk_window(5, total) == 1
            # alpha jump steps come from the schedule
            trainer.schedule.next_alpha_jump_step = 3
            assert trainer._chunk_window(1, total) == 1
            trainer.schedule.next_alpha_jump_step = 0
            # never run past `total`
            assert trainer._chunk_window(total - 2, total) == 1
        finally:
            trainer.close()


class TestLazyR1Windows:
    """Lazy R1's production path: r1-leading dispatch windows (StyleGAN2
    §5.1 cadence made STRUCTURAL — sub-step 0 carries the penalty scaled
    by the window length, the scanned tail doesn't; no runtime
    conditional, because grad-of-`lax.cond` gives both branches the union
    of their residual signatures and the skip branch then saves nothing —
    measured round 5, make_train_step docstring)."""

    def test_window_matches_manual_lead_plus_tail(self):
        # one r1_leading window == lead program (R1 ×k) then k-1 plain
        # steps, dispatched manually — bit-for-bit state evolution
        cfg = _cfg(loss_mode="r1", r1_interval=8)
        opt_g, opt_d = make_optimizers(cfg)
        scale, k, alpha = 1, 3, 0.4
        state = _state(cfg, scale, opt_g, opt_d)
        rng = np.random.default_rng(11)
        batches = [rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
                   for _ in range(k)]

        lead = make_train_step(cfg, scale, opt_g, opt_d,
                               include_r1=True, r1_scale=float(k))
        tail = make_train_step(cfg, scale, opt_g, opt_d, include_r1=False)
        seq = _copy(state)
        seq, m_lead, _ = lead(seq, batches[0], jnp.float32(alpha))
        for b in batches[1:]:
            seq, m_seq, _ = tail(seq, b, jnp.float32(alpha))

        win = make_chunked_train_step(cfg, scale, opt_g, opt_d, k,
                                      r1_leading=True)
        out, m_win, _ = win(_copy(state),
                            [jnp.asarray(b) for b in batches],
                            jnp.float32(alpha))
        for a, b in zip(jax.tree.leaves(seq), jax.tree.leaves(out)):
            np.testing.assert_allclose(np.asarray(a, np.float64),
                                       np.asarray(b, np.float64),
                                       rtol=1e-5, atol=1e-6)
        # the window surfaces the lead's penalty (its ONLY evaluation),
        # other metrics come from the last sub-step
        np.testing.assert_allclose(float(m_win["L_D_r1"]),
                                   float(m_lead["L_D_r1"]), rtol=1e-6)
        np.testing.assert_allclose(float(m_win["L_D"]),
                                   float(m_seq["L_D"]), rtol=1e-5)
        assert float(m_win["L_D_r1"]) > 0

    def test_lead_penalty_scales_with_actual_window_length(self):
        # truncated windows scale by the ACTUAL length k, not the nominal
        # interval — the time-average regularization weight stays exactly γ
        cfg = _cfg(loss_mode="r1", r1_interval=16)
        opt_g, opt_d = make_optimizers(cfg)
        img = np.random.default_rng(5).integers(
            0, 256, (4, 4, 4, 3), dtype=np.uint8)
        a = jnp.float32(1.0)
        vals = {}
        for k in (1.0, 3.0):
            state = _state(cfg, 0, opt_g, opt_d)
            fn = make_train_step(cfg, 0, opt_g, opt_d,
                                 include_r1=True, r1_scale=k)
            _, m, _ = fn(state, img, a)
            vals[k] = float(m["L_D_r1"])
        np.testing.assert_allclose(vals[3.0], 3 * vals[1.0], rtol=1e-5)

    def test_r1_leading_requires_lazy_config(self):
        opt_g, opt_d = make_optimizers(_cfg())
        with pytest.raises(ValueError, match="r1_leading"):
            make_chunked_train_step(_cfg(), 0, opt_g, opt_d, 4,
                                    r1_leading=True)
        wg = _cfg(loss_mode="wgangp", r1_interval=4)
        opt_g, opt_d = make_optimizers(wg)
        with pytest.raises(ValueError, match="r1_leading"):
            make_chunked_train_step(wg, 0, opt_g, opt_d, 4, r1_leading=True)

    def test_trainer_lazy_window_truncates_at_boundaries(self, tmp_path):
        cfg = _smoke_cfg(tmp_path, loss_mode="r1", r1_interval=4,
                         loss_cycle=6, test_cycle=1000, ckpt_cycle=1000)
        trainer = create_model(cfg)
        try:
            total = 1000
            # full window when no boundary falls inside [step, step+4)
            assert trainer._chunk_window(1, total) == 4
            # loss_cycle=6: a window starting at 3 truncates before step 6
            assert trainer._chunk_window(3, total) == 3
            # starting ON a boundary yields a k=1 window (penalty ×1)
            assert trainer._chunk_window(6, total) == 1
            # alpha jumps truncate too
            trainer.schedule.next_alpha_jump_step = 2
            assert trainer._chunk_window(1, total) == 1
            trainer.schedule.next_alpha_jump_step = 10**9
            # never run past `total`
            assert trainer._chunk_window(total - 2, total) == 2
        finally:
            trainer.close()

    def test_trainer_lazy_fit_runs_windows(self, tmp_path):
        """A short lazy-R1 fit dispatches r1-leading windows, logs at the
        reference steps, and reports a nonzero penalty (each logged step
        starts a window, so its metrics come from a program whose lead —
        or single step — carries the penalty)."""
        cfg = _smoke_cfg(tmp_path, loss_mode="r1", r1_interval=4,
                         loss_cycle=8)
        trainer = create_model(cfg)
        try:
            trainer.fit("lazywin", max_step=20)
            # window programs were built and cached per length
            assert trainer._chunks_dispatched > 0
            assert all(k >= 2 for k in trainer._lazy_chunk_fns)
            path = os.path.join(str(tmp_path / "results"), "lazywin",
                                "metrics.jsonl")
            recs = [json.loads(l) for l in open(path)]
            steps = [r["step"] for r in recs]
            assert steps == [0, 8, 16]
            assert all(r["L_D_r1"] > 0 for r in recs)
        finally:
            trainer.close()
