"""Generator weight EMA (g_ema_decay) — the PGGAN paper's G smoothing
(Karras et al. 2018 §A.1), which the reference omits. Off by default
(reference parity); when on, the fused step maintains the average, scale
jumps grow it, checkpoints carry it (`Gema`), and eval/demo can use it.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pggan_tpu import Config
from pggan_tpu.models import init_generator_params, init_discriminator_params
from pggan_tpu.train import make_train_step, make_optimizers
from pggan_tpu.train.step import init_train_state

DEPTHS = [16, 16, 8]
LATENT = 32


def setup_state(cfg, scale=0, seed=0):
    rng = jax.random.PRNGKey(seed)
    kg, kd, ks = jax.random.split(rng, 3)
    pG = init_generator_params(kg, latent_dim=LATENT, depths=DEPTHS, scale=scale)
    pD = init_discriminator_params(kd, depths=DEPTHS, scale=scale)
    og, od = make_optimizers(cfg)
    ema = "g_ema_decay" in cfg and float(cfg["g_ema_decay"]) > 0.0
    return init_train_state(ks, pG, pD, og, od, ema=ema), og, od


def batch(b, res, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randint(
        0, 256, (b, res, res, 3), dtype=np.uint8))


def base_cfg(**over):
    return Config({"depths": DEPTHS, "latent_dim": LATENT,
                   "donate_buffers": False, **over})


class TestEMAStep:
    def test_off_by_default_state_unchanged(self):
        cfg = base_cfg()
        state, og, od = setup_state(cfg)
        assert state.params_G_ema is None
        fn = make_train_step(cfg, 0, og, od)
        new_state, _, _ = fn(state, batch(8, 4), jnp.float32(0.0))
        assert new_state.params_G_ema is None
        # None is an empty pytree node: leaf count identical to pre-EMA
        assert len(jax.tree.leaves(new_state)) == \
            len(jax.tree.leaves(state._replace(params_G_ema=None)))

    def test_ema_matches_manual_recursion(self):
        decay = 0.5
        cfg = base_cfg(g_ema_decay=decay)
        state, og, od = setup_state(cfg)
        # seeded as a copy of params_G
        for e, p in zip(jax.tree.leaves(state.params_G_ema),
                        jax.tree.leaves(state.params_G)):
            np.testing.assert_array_equal(np.asarray(e), np.asarray(p))
        fn = make_train_step(cfg, 0, og, od)
        expected = jax.tree.map(np.asarray, state.params_G_ema)
        for i in range(3):
            state, _, _ = fn(state, batch(8, 4, seed=i), jnp.float32(0.0))
            expected = jax.tree.map(
                lambda e, p: e * decay + np.asarray(p) * (1 - decay),
                expected, state.params_G)
            for e, want in zip(jax.tree.leaves(state.params_G_ema),
                               jax.tree.leaves(expected)):
                np.testing.assert_allclose(np.asarray(e), want,
                                           rtol=1e-6, atol=1e-6)
        # and the average genuinely lags the raw weights
        moved = any(not np.allclose(np.asarray(e), np.asarray(p))
                    for e, p in zip(jax.tree.leaves(state.params_G_ema),
                                    jax.tree.leaves(state.params_G)))
        assert moved

    def test_ema_params_generate(self):
        """The smoothed tree is a drop-in for generator_apply."""
        from pggan_tpu.models import generator_apply
        cfg = base_cfg(g_ema_decay=0.9)
        state, og, od = setup_state(cfg, scale=1)
        fn = make_train_step(cfg, 1, og, od)
        state, _, _ = fn(state, batch(8, 8), jnp.float32(0.5))
        z = jax.random.normal(jax.random.PRNGKey(0), (2, LATENT))
        out = generator_apply(state.params_G_ema, z, jnp.float32(0.5))
        assert out.shape == (2, 8, 8, 3)
        assert np.all(np.isfinite(np.asarray(out)))


class TestEMATrainer:
    def _trainer_cfg(self, tmp_path, **over):
        return Config({
            "depths": DEPTHS, "latent_dim": LATENT, "batch_per_gpu": 8,
            "save_root": str(tmp_path), "data_backend": "synthetic",
            "synthetic_dataset_size": 64, "num_data_workers": 0,
            "prefetch_depth": 1, "max_step_at_scale": [4, 4, 4],
            "alpha_jump_start": [-1, 1, 1], "alpha_jump_interval": [0, 1, 1],
            "alpha_jump_Ntimes": [0, 2, 2], "max_step": 10,
            "loss_cycle": 100, "test_cycle": 100, "ckpt_cycle": 100,
            "g_ema_decay": 0.9, **over})

    def test_grow_then_checkpoint_roundtrip(self, tmp_path):
        from pggan_tpu.registry import create_model
        trainer = create_model(self._trainer_cfg(tmp_path))
        try:
            # step at scale 0
            trainer.check_jump(0)
            trainer.global_step = 0
            trainer.train_step()
            # jump to scale 1: EMA tree must grow in lockstep
            trainer.check_jump(4)
            assert trainer.schedule.scale_index == 1
            ema_leaves = jax.tree_util.tree_flatten_with_path(
                trainer.state.params_G_ema)[0]
            g_leaves = jax.tree_util.tree_flatten_with_path(
                trainer.state.params_G)[0]
            assert [k for k, _ in ema_leaves] == [k for k, _ in g_leaves]
            # brand-new block leaves start identical in both trees
            # at scale 1 the freshly-grown leaves are blocks[0] + torgb[1]
            keystr = jax.tree_util.keystr
            fresh = [(np.asarray(e), np.asarray(p))
                     for (kp, e), (_, p) in zip(ema_leaves, g_leaves)
                     if "blocks'][0]" in keystr(kp).replace('"', "'")
                     or "torgb'][1]" in keystr(kp).replace('"', "'")]
            assert fresh
            for e, p in fresh:
                np.testing.assert_array_equal(e, p)

            trainer.train_step()
            trainer.cfg.run_id = "ema_run"
            trainer.save_checkpoint(5, wait=True)
            ckpts = sorted((tmp_path / "ema_run" / "ckpt").iterdir())
            names = {p.name for p in ckpts}
            assert "Gema_5.npz" in names and "Gema_latest.npz" in names

            before = jax.tree.map(np.asarray, trainer.state.params_G_ema)
        finally:
            trainer.close()

        # resume: EMA restored exactly
        cfg2 = self._trainer_cfg(tmp_path, ckpt_id="ema_run", ckpt_step=5)
        trainer2 = create_model(cfg2)
        try:
            for a, b in zip(jax.tree.leaves(trainer2.state.params_G_ema),
                            jax.tree.leaves(before)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        finally:
            trainer2.close()

    def test_enable_ema_on_resume(self, tmp_path):
        """Resuming a no-EMA run with an explicit g_ema_decay starts EMA
        (seeded from params): the resume config's explicitly-set keys must
        override the checkpoint's snapshotted args, which always carry
        g_ema_decay=0.0 for such runs."""
        from pggan_tpu.registry import create_model
        trainer = create_model(self._trainer_cfg(tmp_path, g_ema_decay=0.0))
        try:
            trainer.check_jump(0)
            trainer.global_step = 0
            trainer.train_step()
            assert trainer.state.params_G_ema is None
            trainer.cfg.run_id = "noema_run"
            trainer.save_checkpoint(1, wait=True)
        finally:
            trainer.close()

        cfg2 = self._trainer_cfg(tmp_path, g_ema_decay=0.9,
                                 ckpt_id="noema_run", ckpt_step=1)
        trainer2 = create_model(cfg2)
        try:
            assert float(trainer2.cfg.g_ema_decay) == 0.9
            assert trainer2.state.params_G_ema is not None
            # seeded from the restored params
            for e, p in zip(jax.tree.leaves(trainer2.state.params_G_ema),
                            jax.tree.leaves(trainer2.state.params_G)):
                np.testing.assert_array_equal(np.asarray(e), np.asarray(p))
        finally:
            trainer2.close()

    def test_demo_ema_flag(self, tmp_path):
        from pggan_tpu.registry import create_model
        trainer = create_model(self._trainer_cfg(tmp_path))
        try:
            trainer.check_jump(0)
            trainer.global_step = 0
            trainer.train_step()
            trainer.cfg.run_id = "demo_ema"
            trainer.save_checkpoint(1, wait=True)
        finally:
            trainer.close()
        import demo
        rc = demo.main(["--ckpt_id", "demo_ema", "--save_root", str(tmp_path),
                        "--n_samples", "2", "--ema",
                        "--output_dir", str(tmp_path / "out")])
        assert rc == 0
        outs = list((tmp_path / "out").iterdir())
        assert len(outs) == 2
