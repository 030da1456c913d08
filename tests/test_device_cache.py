"""Device-resident dataset cache (`data/device_cache.py`).

The HBM fast path must be stream-transparent: which images, flips and
jitter factors a step sees are byte-identical to the host backends
(shared seed draws, `data/augment.py`); the jitter arithmetic mirrors the
native C++ chain (`native/loader.cpp:253-347`) and is pinned here against
a numpy golden port of that chain, plus tolerance-checked against the
real host path (PIL/native, which quantize differently by design).
"""

import numpy as np
import pytest
from PIL import Image

import jax

from pggan_tpu import Config
from pggan_tpu.data import DataPipeline, ImageFolderDataset
from pggan_tpu.data.augment import DEFAULT_JITTER, draw_augment_params
from pggan_tpu.data.device_cache import (DeviceDataCache, assemble_batch,
                                         resolve_device_data_cache)
from pggan_tpu.parallel import create_mesh


@pytest.fixture
def image_dir(tmp_path):
    root = tmp_path / "faces"
    root.mkdir()
    rs = np.random.RandomState(7)
    for i in range(5):
        arr = rs.randint(0, 256, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"img{i}.png")
    return str(root)


# ---- numpy golden: the native augment chain, loader.cpp:253-347 ----------

def _np_lum(x):
    return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]


def _np_augment(img_u8, flip, factors, order):
    x = img_u8.astype(np.float32)
    if flip:
        x = x[:, ::-1, :]
    for k in range(4):
        op = int(order[k])
        if op == 0 and factors[0] >= 0:
            x = np.clip(x * factors[0], 0.0, 255.0)
        elif op == 1 and factors[1] >= 0:
            m = np.float32(_np_lum(x).mean(dtype=np.float64))
            x = np.clip(factors[1] * x + (1 - factors[1]) * m, 0.0, 255.0)
        elif op == 2 and factors[2] >= 0:
            g = _np_lum(x)[..., None]
            x = np.clip(factors[2] * x + (1 - factors[2]) * g, 0.0, 255.0)
        elif op == 3 and factors[3] > -1.0:
            r, g, b = x[..., 0] / 255.0, x[..., 1] / 255.0, x[..., 2] / 255.0
            mx = np.maximum(np.maximum(r, g), b)
            mn = np.minimum(np.minimum(r, g), b)
            d = mx - mn
            sd = np.where(d > 0, d, 1.0)
            h = np.where(mx == r, np.mod((g - b) / sd, 6.0),
                         np.where(mx == g, (b - r) / sd + 2.0,
                                  (r - g) / sd + 4.0)) / 6.0
            h = np.where(d > 0, h, 0.0)
            s = np.where(mx > 0, d / np.where(mx > 0, mx, 1.0), 0.0)
            v = mx
            h = h + factors[3]
            h -= np.floor(h)
            hh = h * 6.0
            sector = np.floor(hh).astype(np.int32) % 6
            frac = hh - np.floor(hh)
            p = v * (1 - s)
            q = v * (1 - s * frac)
            t = v * (1 - s * (1 - frac))
            nr = np.select([sector == 0, sector == 1, sector == 2,
                            sector == 3, sector == 4], [v, q, p, p, t], v)
            ng = np.select([sector == 0, sector == 1, sector == 2,
                            sector == 3, sector == 4], [t, v, v, q, p], p)
            nb = np.select([sector == 0, sector == 1, sector == 2,
                            sector == 3, sector == 4], [p, p, t, v, v], q)
            x = np.clip(np.stack([nr, ng, nb], -1) * 255.0, 0.0, 255.0)
    return np.clip(np.floor(x + 0.5), 0, 255).astype(np.uint8)


class TestAssembleGolden:
    def test_matches_numpy_golden(self):
        rs = np.random.RandomState(0)
        data = rs.randint(0, 256, (6, 16, 16, 3), dtype=np.uint8)
        idx = np.array([3, 0, 5, 3], np.int32)
        flips = np.array([1, 0, 1, 0], np.int32)
        factors = np.stack([
            draw_augment_params(np.random.RandomState(100 + i))[1]
            for i in range(4)])
        orders = np.stack([
            draw_augment_params(np.random.RandomState(100 + i))[2]
            for i in range(4)])
        got = np.asarray(jax.jit(assemble_batch)(
            data, idx, flips, factors, orders))
        want = np.stack([
            _np_augment(data[idx[i]], flips[i], factors[i], orders[i])
            for i in range(4)])
        # same f32 chain; only reduction order differs (contrast mean)
        assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1

    def test_disabled_ops_bit_exact(self):
        """augment=False params must pass pixels through untouched —
        disabled ops select the ORIGINAL values, no identity arithmetic."""
        rs = np.random.RandomState(1)
        data = rs.randint(0, 256, (3, 8, 8, 3), dtype=np.uint8)
        idx = np.array([2, 0], np.int32)
        flip, factors, order = draw_augment_params(None, augment=False)
        got = np.asarray(jax.jit(assemble_batch)(
            data, idx, np.array([flip] * 2, np.int32),
            np.stack([factors] * 2), np.stack([order] * 2)))
        np.testing.assert_array_equal(got, data[idx])

    def test_flip_bit_exact(self):
        rs = np.random.RandomState(2)
        data = rs.randint(0, 256, (2, 8, 8, 3), dtype=np.uint8)
        _, factors, order = draw_augment_params(None, augment=False)
        got = np.asarray(jax.jit(assemble_batch)(
            data, np.array([1], np.int32), np.array([1], np.int32),
            factors[None], order[None]))
        np.testing.assert_array_equal(got[0], data[1][:, ::-1, :])


class TestDeviceCache:
    def test_host_path_tolerance(self, image_dir):
        """Device batches track the production host path (PIL quantizes
        between ops; native is a separate f32 chain) within a few LSB."""
        ds = ImageFolderDataset([image_dir], scale_index=3)  # 32px native
        mesh = create_mesh()
        cache = DeviceDataCache(ds, mesh)
        seeds = [11, 22, 33, 44, 55]
        idxs = [0, 1, 2, 3, 4]
        got = np.asarray(cache.assemble(idxs, seeds))
        want = np.stack([ds.get(i, np.random.RandomState(s))
                         for i, s in zip(idxs, seeds)])
        assert got.shape == want.shape
        delta = np.abs(got.astype(int) - want.astype(int))
        assert delta.max() <= 6 and delta.mean() < 1.0

    def test_unaugmented_bit_exact(self, image_dir):
        ds = ImageFolderDataset([image_dir], scale_index=3, augment=False)
        cache = DeviceDataCache(ds, create_mesh())
        got = np.asarray(cache.assemble([4, 2], [1, 2]))
        want = np.stack([ds.get(4, np.random.RandomState(1)),
                         ds.get(2, np.random.RandomState(2))])
        np.testing.assert_array_equal(got, want)

    def test_index_wraparound(self, image_dir):
        """Tiled indices (tiny datasets) hit `index % n` like dataset.get."""
        ds = ImageFolderDataset([image_dir], scale_index=3, augment=False)
        cache = DeviceDataCache(ds, create_mesh())
        got = np.asarray(cache.assemble([7, 12], [0, 0]))
        want = np.stack([ds.get(7, None), ds.get(12, None)])
        np.testing.assert_array_equal(got, want)

    def test_batch_sharded_over_mesh(self, image_dir):
        from pggan_tpu.parallel.mesh import batch_sharding
        ds = ImageFolderDataset([image_dir], scale_index=3)
        mesh = create_mesh()
        cache = DeviceDataCache(ds, mesh)
        out = cache.assemble(list(range(8)), list(range(8)))
        assert out.sharding == batch_sharding(mesh)


class TestPipelineStreamParity:
    def test_same_stream_as_host_pipeline(self, image_dir):
        """The (index, flip) stream is backend-independent: with jitter a
        no-op (augment=False) the device pipeline's batches equal the host
        pipeline's BIT-exactly, across epochs and a fast-forward."""
        for start in (0, 3):
            ds = ImageFolderDataset([image_dir], scale_index=3,
                                    augment=False)
            cache = DeviceDataCache(ds, create_mesh())
            kw = dict(num_workers=2, prefetch_depth=2, seed=5,
                      start_batch=start)
            host = DataPipeline(ds, 4, **kw)
            dev = DataPipeline(ds, 4, assemble_fn=cache.assemble, **kw)
            try:
                for _ in range(4):
                    np.testing.assert_array_equal(
                        np.asarray(next(dev)), next(host))
            finally:
                host.close()
                dev.close()


class TestResolveGate:
    def test_auto_requires_fit(self, image_dir):
        ds = ImageFolderDataset([image_dir], scale_index=3)
        mesh = create_mesh()
        assert resolve_device_data_cache(
            Config({"device_data_cache": "auto"}), ds, mesh)
        assert not resolve_device_data_cache(
            Config({"device_data_cache": "auto", "device_cache_mb": 0}),
            ds, mesh)
        assert not resolve_device_data_cache(
            Config({"device_data_cache": False}), ds, mesh)

    def test_explicit_true_raises_when_unmet(self, image_dir):
        ds = ImageFolderDataset([image_dir], scale_index=3)
        with pytest.raises(ValueError):
            resolve_device_data_cache(
                Config({"device_data_cache": True, "device_cache_mb": 0}),
                ds, create_mesh())

    def test_synthetic_dataset_skipped(self):
        from pggan_tpu.data import SyntheticDataset
        ok = resolve_device_data_cache(
            Config({"device_data_cache": "auto"}),
            SyntheticDataset(8, 0), create_mesh())
        assert not ok


class TestTrainerIntegration:
    def test_devcache_chunked_matches_host_unchunked(self, image_dir,
                                                     tmp_path):
        """The round-4 production composition — device cache + chunked
        dispatch — must train identically to host pipeline + per-step
        dispatch: with augmentation off the sample stream is bit-exact
        (TestPipelineStreamParity), and the chunk is pure state evolution,
        so final params match within cross-program compile tolerance."""
        from pggan_tpu.registry import create_model
        finals = {}
        for tag, over in (("host", {}),
                          ("devchunk", {"device_data_cache": True,
                                        "steps_per_dispatch": 4})):
            cfg = Config({
                "depths": [16, 16], "latent_dim": 32, "batch_per_gpu": 1,
                "max_step_at_scale": [16, 16],
                "alpha_jump_start": [-1, 4], "alpha_jump_interval": [0, 2],
                "alpha_jump_Ntimes": [0, 2],
                "loss_cycle": 8, "test_cycle": 100, "ckpt_cycle": 100,
                "fid_cycle": 0, "use_validation": False,
                "save_root": str(tmp_path / tag),
                "dataset_root_list": [image_dir], "data_backend": "folder",
                "augment": False, "num_data_workers": 2, "use_mGPU": True,
                "seed": 11, **over,
            })
            trainer = create_model(cfg)
            try:
                trainer.fit(tag, max_step=12)
                finals[tag] = (jax.device_get(trainer.state.params_G),
                               jax.device_get(trainer.state.params_D),
                               trainer._chunks_dispatched,
                               trainer._device_cache is not None)
            finally:
                trainer.close()
        assert finals["host"][2] == 0 and not finals["host"][3]
        assert finals["devchunk"][2] > 0 and finals["devchunk"][3]
        for a, b in zip(jax.tree_util.tree_leaves(finals["host"][:2]),
                        jax.tree_util.tree_leaves(finals["devchunk"][:2])):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

    def test_trainer_device_cache_steps(self, image_dir, tmp_path):
        from pggan_tpu.registry import create_model
        cfg = Config({
            "depths": [16, 16], "latent_dim": 32, "batch_per_gpu": 1,
            "max_step_at_scale": [4, 4],
            "alpha_jump_start": [-1, 1], "alpha_jump_interval": [0, 1],
            "alpha_jump_Ntimes": [0, 2],
            "loss_cycle": 2, "test_cycle": 100, "ckpt_cycle": 100,
            "fid_cycle": 0, "use_validation": False,
            "save_root": str(tmp_path / "g"),
            "dataset_root_list": [image_dir], "data_backend": "folder",
            "device_data_cache": True,
            "num_data_workers": 2, "use_mGPU": True,
        })
        trainer = create_model(cfg)
        try:
            assert trainer._device_cache is not None
            trainer.fit("devcache_run", max_step=3)
            assert trainer.global_step == 3
            assert all(np.isfinite(float(v))
                       for v in trainer._last_metrics.values())
        finally:
            trainer.close()

    def test_devcache_lazy_r1_windows_match_host(self, image_dir, tmp_path):
        """The round-5 production composition — device cache + lazy-R1
        r1-leading windows (r1_interval > 1) — must train identically to
        host pipeline + the same lazy windows: with augmentation off the
        sample stream is bit-exact (TestPipelineStreamParity) and the
        window structure depends only on (step, cycles, jumps), so both
        sides dispatch the same programs over the same data."""
        from pggan_tpu.registry import create_model
        finals = {}
        for tag, over in (("hostlazy", {}),
                          ("devlazy", {"device_data_cache": True})):
            cfg = Config({
                "depths": [16, 16], "latent_dim": 32, "batch_per_gpu": 1,
                "max_step_at_scale": [16, 16],
                "alpha_jump_start": [-1, 4], "alpha_jump_interval": [0, 2],
                "alpha_jump_Ntimes": [0, 2],
                "loss_mode": "r1", "r1_interval": 4,
                "loss_cycle": 8, "test_cycle": 100, "ckpt_cycle": 100,
                "fid_cycle": 0, "use_validation": False,
                "save_root": str(tmp_path / tag),
                "dataset_root_list": [image_dir], "data_backend": "folder",
                "augment": False, "num_data_workers": 2, "use_mGPU": True,
                "seed": 11, **over,
            })
            trainer = create_model(cfg)
            try:
                trainer.fit(tag, max_step=12)
                finals[tag] = (jax.device_get(trainer.state.params_G),
                               jax.device_get(trainer.state.params_D),
                               trainer._chunks_dispatched,
                               trainer._device_cache is not None)
            finally:
                trainer.close()
        # both sides dispatch lazy windows; only the input path differs
        assert finals["hostlazy"][2] > 0 and not finals["hostlazy"][3]
        assert finals["devlazy"][2] > 0 and finals["devlazy"][3]
        for a, b in zip(jax.tree_util.tree_leaves(finals["hostlazy"][:2]),
                        jax.tree_util.tree_leaves(finals["devlazy"][:2])):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
