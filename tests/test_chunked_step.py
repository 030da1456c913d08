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
