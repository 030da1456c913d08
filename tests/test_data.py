"""Data pipeline tests: folder dataset, augmentation, split, prefetch."""

import os

import numpy as np
import pytest
from PIL import Image

from pggan_tpu.data import (
    DataPipeline, ImageFolderDataset, SyntheticDataset,
    list_image_paths, split_dataset, build_dataset,
)
from pggan_tpu import Config


@pytest.fixture
def image_dir(tmp_path):
    root = tmp_path / "faces"
    (root / "sub").mkdir(parents=True)
    rs = np.random.RandomState(0)
    for i in range(6):
        arr = rs.randint(0, 256, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"img{i}.jpg")
    for i in range(3):
        arr = rs.randint(0, 256, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "sub" / f"sub{i}.png")
    return str(root)


class TestListing:
    def test_recursive_glob(self, image_dir):
        paths = list_image_paths([image_dir])
        assert len(paths) == 9                    # 6 jpg + 3 png in subdir

    def test_multiple_roots(self, image_dir):
        paths = list_image_paths([image_dir, image_dir])
        assert len(paths) == 18


class TestFolderDataset:
    def test_resolution_per_scale(self, image_dir):
        for scale, res in ((0, 4), (1, 8), (2, 16)):
            ds = ImageFolderDataset([image_dir], scale)
            img = ds.get(0, np.random.RandomState(0))
            assert img.shape == (res, res, 3)
            assert img.dtype == np.uint8

    def test_augmentation_varies(self, image_dir):
        ds = ImageFolderDataset([image_dir], 2)
        a = ds.get(0, np.random.RandomState(1))
        b = ds.get(0, np.random.RandomState(2))
        assert not np.array_equal(a, b)

    def test_no_augment_deterministic(self, image_dir):
        ds = ImageFolderDataset([image_dir], 2, augment=False)
        a = ds.get(0, np.random.RandomState(1))
        b = ds.get(0, np.random.RandomState(2))
        np.testing.assert_array_equal(a, b)

    def test_decode_cache_matches_uncached(self, image_dir):
        """Decode-once caching: same seed → same draw; vs the uncached
        path at most the one documented uint8 quantization LSB apart,
        and bit-identical when augmentation is off."""
        cached = ImageFolderDataset([image_dir], 2, cache_decoded=True)
        uncached = ImageFolderDataset([image_dir], 2, cache_decoded=False)
        assert cached._cache is not None and uncached._cache is None
        a = cached.get(1, np.random.RandomState(7))
        b = cached.get(1, np.random.RandomState(7))   # second hit = cache
        np.testing.assert_array_equal(a, b)
        c = uncached.get(1, np.random.RandomState(7))
        assert np.abs(a.astype(int) - c.astype(int)).max() <= 1
        cached_na = ImageFolderDataset([image_dir], 2, cache_decoded=True,
                                       augment=False)
        uncached_na = ImageFolderDataset([image_dir], 2, cache_decoded=False,
                                         augment=False)
        np.testing.assert_array_equal(
            cached_na.get(2, np.random.RandomState(0)),
            uncached_na.get(2, np.random.RandomState(0)))

    def test_decode_cache_auto_respects_budget(self, image_dir):
        big = ImageFolderDataset([image_dir], 2, decode_cache_mb=0)
        assert big._cache is None                 # over budget → off
        small = ImageFolderDataset([image_dir], 2, decode_cache_mb=64)
        assert small._cache is not None           # 9×16²×3 ≪ 64 MB

    def test_empty_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            ImageFolderDataset([str(tmp_path)], 0)


class TestSplit:
    def test_70_30(self):
        tr, va = split_dataset(100)
        assert len(tr) == 70 and len(va) == 30
        assert set(tr) | set(va) == set(range(100))
        assert not set(tr) & set(va)

    def test_deterministic(self):
        a, _ = split_dataset(50, seed=42)
        b, _ = split_dataset(50, seed=42)
        np.testing.assert_array_equal(a, b)


class TestPipeline:
    def test_batches_flow(self, image_dir):
        ds = ImageFolderDataset([image_dir], 1)
        with DataPipeline(ds, 4, num_workers=2, prefetch_depth=2) as pipe:
            for _ in range(5):
                b = next(pipe)
                assert b.shape == (4, 8, 8, 3)
                assert b.dtype == np.uint8

    def test_small_dataset_tiles(self, image_dir):
        ds = ImageFolderDataset([image_dir], 0)
        with DataPipeline(ds, 32, num_workers=2) as pipe:     # 32 > 9 images
            b = next(pipe)
            assert b.shape == (32, 4, 4, 3)

    def test_synthetic(self):
        ds = SyntheticDataset(64, scale_index=2)
        with DataPipeline(ds, 8, num_workers=2) as pipe:
            b = next(pipe)
            assert b.shape == (8, 16, 16, 3)

    def test_shard_fn_applied(self):
        ds = SyntheticDataset(64, scale_index=0)
        with DataPipeline(ds, 8, num_workers=1,
                          shard_fn=lambda b: b.astype(np.float32)) as pipe:
            assert next(pipe).dtype == np.float32

    def test_start_batch_fast_forwards_exactly(self):
        # exact-resume: skipping k batches must reproduce the identical
        # continuation of the stream — permutation AND augmentation draws
        # advance, nothing is decoded for the prefix. k=9 crosses an epoch
        # boundary (dataset 24 / batch 4 → 6 batches per epoch).
        ds = SyntheticDataset(24, scale_index=0)
        with DataPipeline(ds, 4, num_workers=1, seed=5) as pipe:
            full = [next(pipe) for _ in range(12)]
        with DataPipeline(ds, 4, num_workers=1, seed=5,
                          start_batch=9) as pipe:
            resumed = [next(pipe) for _ in range(3)]
        for got, want in zip(resumed, full[9:]):
            np.testing.assert_array_equal(got, want)


class TestPairedDatasets:
    def test_paired_train(self, image_dir):
        from pggan_tpu.data import PairedFaceDataset
        ds = PairedFaceDataset([image_dir], same_prob=1.0, resolution=32)
        xs, xt, same = ds.get(0, np.random.RandomState(0))
        assert xs.shape == (32, 32, 3) and xt.shape == (32, 32, 3)
        assert same == 1

    def test_paired_same_prob_zero(self, image_dir):
        from pggan_tpu.data import PairedFaceDataset
        ds = PairedFaceDataset([image_dir], same_prob=0.0, resolution=16)
        sames = [ds.get(i, np.random.RandomState(i))[2] for i in range(10)]
        assert all(s == 0 for s in sames)

    def test_paired_valid(self, tmp_path):
        from pggan_tpu.data import PairedValidDataset
        rs = np.random.RandomState(0)
        for sub in ("source", "target"):
            (tmp_path / "v" / sub).mkdir(parents=True)
            for i in range(3):
                Image.fromarray(rs.randint(0, 256, (16, 16, 3), dtype=np.uint8)
                                ).save(tmp_path / "v" / sub / f"{i}.png")
        ds = PairedValidDataset(str(tmp_path / "v"), resolution=16)
        assert len(ds) == 3
        xs, xt = ds.get(0)
        assert xs.shape == (16, 16, 3) and xt.shape == (16, 16, 3)


class TestGrainPipeline:
    def test_batches_flow(self):
        from pggan_tpu.data.grain_pipeline import GrainPipeline
        ds = SyntheticDataset(64, scale_index=1)
        with GrainPipeline(ds, 8, num_workers=2) as pipe:
            for _ in range(3):
                b = next(pipe)
                assert b.shape == (8, 8, 8, 3) and b.dtype == np.uint8

    def test_small_dataset_repeats(self):
        from pggan_tpu.data.grain_pipeline import GrainPipeline
        ds = SyntheticDataset(4, scale_index=0)
        with GrainPipeline(ds, 16, num_workers=1) as pipe:
            assert next(pipe).shape == (16, 4, 4, 3)

    def test_start_batch_fast_forwards_exactly(self):
        from pggan_tpu.data.grain_pipeline import GrainPipeline
        ds = SyntheticDataset(24, scale_index=0)
        with GrainPipeline(ds, 4, num_workers=1, seed=5) as pipe:
            full = [next(pipe) for _ in range(12)]
        with GrainPipeline(ds, 4, num_workers=1, seed=5,
                           start_batch=9) as pipe:
            resumed = [next(pipe) for _ in range(3)]
        for got, want in zip(resumed, full[9:]):
            np.testing.assert_array_equal(got, want)

    def test_trainer_uses_grain_backend(self, tmp_path):
        from pggan_tpu import Config
        from pggan_tpu.registry import create_model
        cfg = Config({
            "depths": [16, 16], "latent_dim": 32, "batch_per_gpu": 1,
            "max_step_at_scale": [4, 4],
            "alpha_jump_start": [-1, 1], "alpha_jump_interval": [0, 1],
            "alpha_jump_Ntimes": [0, 2],
            "loss_cycle": 2, "test_cycle": 100, "ckpt_cycle": 100,
            "save_root": str(tmp_path / "g"), "data_backend": "synthetic",
            "data_backend_impl": "grain", "synthetic_dataset_size": 32,
            "num_data_workers": 2, "use_mGPU": True,
        })
        trainer = create_model(cfg)
        try:
            trainer.fit("grain_run", max_step=3)
            assert trainer.global_step == 3
        finally:
            trainer.close()


class TestBuildDataset:
    def test_auto_falls_back_to_synthetic(self):
        cfg = Config({"dataset_root_list": ["/nonexistent"]})
        ds = build_dataset(cfg, 0)
        assert isinstance(ds, SyntheticDataset)

    def test_auto_picks_folder(self, image_dir):
        cfg = Config({"dataset_root_list": [image_dir]})
        ds = build_dataset(cfg, 0)
        assert isinstance(ds, ImageFolderDataset)

    def test_forced_synthetic(self, image_dir):
        cfg = Config({"dataset_root_list": [image_dir],
                      "data_backend": "synthetic"})
        assert isinstance(build_dataset(cfg, 0), SyntheticDataset)


class TestResizedStore:
    """Out-of-core memmap tier (data/resized_store.py) — the cache level
    for the reference's real 37,345-image regime (README.md:7) where the
    resized dataset exceeds decode_cache_mb."""

    def test_store_draws_match_ram_cache_bitexact(self, image_dir, tmp_path):
        """The store quantizes at exactly the same point as the RAM cache
        (uint8 after resize, before jitter), so same-seed draws are
        bit-identical between the two tiers."""
        ram = ImageFolderDataset([image_dir], 2, cache_decoded=True)
        disk = ImageFolderDataset([image_dir], 2, resized_store=True,
                                  store_dir=str(tmp_path / "store"))
        assert disk._store is not None and disk._cache is None
        for i in (0, 3, 8):
            for seed in (0, 7):
                np.testing.assert_array_equal(
                    ram.get(i, np.random.RandomState(seed)),
                    disk.get(i, np.random.RandomState(seed)))
        # unaugmented rows too (the device-cache upload path)
        for i in range(9):
            np.testing.assert_array_equal(ram.resized_array(i),
                                          disk.resized_array(i))

    def test_auto_engages_only_past_ram_budget(self, image_dir, tmp_path):
        store_dir = str(tmp_path / "store")
        # fits RAM budget -> RAM cache, no store
        ds = ImageFolderDataset([image_dir], 2, decode_cache_mb=8192,
                                store_dir=store_dir)
        assert ds._cache is not None and ds._store is None
        # over RAM budget (0 MB) -> store
        ds = ImageFolderDataset([image_dir], 2, decode_cache_mb=0,
                                store_dir=store_dir)
        assert ds._cache is None and ds._store is not None
        # over budget, no store_dir -> per-draw decode fallback
        ds = ImageFolderDataset([image_dir], 2, decode_cache_mb=0)
        assert ds._cache is None and ds._store is None
        # explicitly disabled
        ds = ImageFolderDataset([image_dir], 2, decode_cache_mb=0,
                                resized_store=False, store_dir=store_dir)
        assert ds._store is None

    def test_forced_store_without_dir_raises(self, image_dir):
        with pytest.raises(ValueError, match="resized_store"):
            ImageFolderDataset([image_dir], 2, resized_store=True)

    def test_built_once_reused_across_constructions(self, image_dir, tmp_path):
        from pggan_tpu.data.resized_store import ResizedStore
        store_dir = str(tmp_path / "store")
        ds1 = ImageFolderDataset([image_dir], 2, resized_store=True,
                                 store_dir=store_dir)
        calls = {"n": 0}

        def counting_decode(path):
            calls["n"] += 1
            return ds1._resize_uncached(path)

        st = ResizedStore(store_dir, ds1.paths, ds1.resolution,
                          counting_decode)
        assert calls["n"] == 0            # complete store: zero re-decodes
        np.testing.assert_array_equal(st.read(4), ds1._store.read(4))

    def test_interrupted_build_resumes(self, image_dir, tmp_path):
        from pggan_tpu.data.resized_store import ResizedStore
        store_dir = str(tmp_path / "store")
        probe = ImageFolderDataset([image_dir], 2, cache_decoded=False)
        paths = probe.paths

        class Boom(RuntimeError):
            pass

        state = {"rows": 0}

        def flaky_decode(path):
            if state["rows"] == 5:
                raise Boom()
            state["rows"] += 1
            return probe._resize_uncached(path)

        # force a progress flush every 2 rows so the resume point is real
        orig_every = ResizedStore.PROGRESS_EVERY
        ResizedStore.PROGRESS_EVERY = 2
        try:
            with pytest.raises(Boom):
                ResizedStore(store_dir, paths, 16, flaky_decode)
            done = {"n": 0}

            def counting_decode(path):
                done["n"] += 1
                return probe._resize_uncached(path)

            st = ResizedStore(store_dir, paths, 16, counting_decode)
            # resumed from the last flushed mark (row 4): only 5 of 9 rows
            # re-decoded, and every row is correct
            assert done["n"] == len(paths) - 4
            for i in range(len(paths)):
                np.testing.assert_array_equal(
                    st.read(i), probe._resize_uncached(paths[i]))
        finally:
            ResizedStore.PROGRESS_EVERY = orig_every

    def test_digest_keys_on_resolution_and_paths(self, image_dir):
        from pggan_tpu.data.resized_store import paths_digest
        paths = sorted(list_image_paths([image_dir]))
        assert paths_digest(paths, 16) != paths_digest(paths, 32)
        assert paths_digest(paths, 16) != paths_digest(paths[:-1], 16)
        assert paths_digest(paths, 16) == paths_digest(list(paths), 16)

    def test_build_dataset_wires_store(self, image_dir, tmp_path):
        cfg = Config({"dataset_root_list": [image_dir],
                      "decode_cache_mb": 0,
                      "save_root": str(tmp_path / "run")})
        ds = build_dataset(cfg, 2)
        assert ds._store is not None
        assert str(tmp_path / "run" / "resized_store") in ds._store._data_path

    def test_pipeline_over_store(self, image_dir, tmp_path):
        ds = ImageFolderDataset([image_dir], 2, resized_store=True,
                                store_dir=str(tmp_path / "store"))
        with DataPipeline(ds, batch_size=4, num_workers=2) as pipe:
            batch = next(pipe)
        assert batch.shape == (4, 16, 16, 3) and batch.dtype == np.uint8
