"""Multi-host branch coverage (single-process harness).

True multi-process runs aren't available here; these tests exercise the
code paths that only fire when `process_count > 1` — the process-local
batch assembly, the addressable-shard concat, and the all-process SPMD
evaluation hooks — so a regression in any of those branches fails fast.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pggan_tpu import Config
from pggan_tpu.parallel import create_mesh, shard_batch
from pggan_tpu.parallel.mesh import local_numpy
from pggan_tpu.registry import create_model


class TestShardingBranches:
    def test_local_numpy_concats_shards_in_order(self):
        mesh = create_mesh(devices=jax.devices())
        batch = np.arange(16 * 4 * 4 * 3, dtype=np.uint8).reshape(16, 4, 4, 3)
        sharded = shard_batch(batch, mesh)
        # each addressable shard is 2 rows of the batch → concat must
        # reconstruct the original order exactly
        assert sharded.sharding.is_fully_addressable
        out = local_numpy(sharded)
        np.testing.assert_array_equal(out, batch)

    def test_shard_batch_process_local_path(self, monkeypatch):
        # force the multi-host branch: make_array_from_process_local_data
        # must produce the same global array as the device_put path
        mesh = create_mesh(devices=jax.devices())
        batch = np.random.RandomState(0).randint(
            0, 255, (16, 4, 4, 3), dtype=np.uint8)
        want = np.asarray(jax.device_get(shard_batch(batch, mesh)))

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        got = shard_batch(batch, mesh)
        monkeypatch.undo()
        np.testing.assert_array_equal(np.asarray(jax.device_get(got)), want)
        assert got.sharding.spec == shard_batch(batch, mesh).sharding.spec

    def test_local_numpy_multihost_guard(self, monkeypatch):
        # the shard-concat branch must behave identically when the array
        # reports as multi-host-style sharded
        mesh = create_mesh(devices=jax.devices())
        batch = np.arange(8 * 2 * 2 * 3, dtype=np.float32).reshape(8, 2, 2, 3)
        sharded = shard_batch(batch, mesh)
        np.testing.assert_array_equal(local_numpy(sharded), batch)

    def test_local_numpy_partial_addressable_concat(self):
        """True multi-host shape: only SOME shards addressable, delivered
        out of order — local_numpy must sort by leading index and concat
        exactly the addressable rows (single-process stub; a real
        partially-addressable jax.Array can't be built in one process)."""

        class _Shard:
            def __init__(self, start, data):
                self.index = (slice(start, start + data.shape[0]),)
                self.data = data

        class _FakeGlobal:
            def __init__(self, shards, global_shape):
                self.addressable_shards = shards
                self.shape = global_shape

        full = np.arange(16 * 2 * 3, dtype=np.float32).reshape(16, 2, 3)
        # this host owns rows 4:8 and 0:4 (listed OUT of order) of a
        # 16-row global batch
        fake = _FakeGlobal([_Shard(4, full[4:8]), _Shard(0, full[0:4])],
                           (16, 2, 3))
        got = local_numpy(fake)
        np.testing.assert_array_equal(got, full[0:8])


def smoke_cfg(tmp_path, **over):
    return Config({
        "depths": [16, 16], "latent_dim": 32, "batch_per_gpu": 1,
        "max_step_at_scale": [6, 8],
        "alpha_jump_start": [-1, 1], "alpha_jump_interval": [0, 1],
        "alpha_jump_Ntimes": [0, 3],
        "loss_cycle": 2, "test_cycle": 2, "ckpt_cycle": 100,
        "save_root": str(tmp_path / "results"),
        "data_backend": "synthetic", "synthetic_dataset_size": 64,
        "num_data_workers": 1, "use_mGPU": True, **over,
    })


class _RecordingDataset:
    """Stub dataset capturing (index, first rng draw) per get()."""

    def __init__(self, n):
        self.n = n
        self.calls = []

    def __len__(self):
        return self.n

    def get(self, index, rng):
        self.calls.append((int(index), int(rng.randint(0, 2**31 - 1))))
        return np.zeros((4, 4, 3), np.uint8)


class TestDataPipelineRankSharding:
    def test_ranks_draw_disjoint_epoch_shards(self):
        """DistributedSampler semantics (`lib/model.py:50`): the shared-
        seed epoch permutation is split round-robin, so two ranks' batches
        are disjoint and together cover the epoch; augmentation rng
        streams differ per rank."""
        from pggan_tpu.data.pipeline import DataPipeline
        n, bs = 32, 8
        per_rank_batches = 2                   # (32/2 ranks)/8 per batch
        draws = {}
        for rank in (0, 1):
            ds = _RecordingDataset(n)
            pipe = DataPipeline(ds, bs, num_workers=1, prefetch_depth=1,
                                seed=123, rank=rank, num_replicas=2)
            it = iter(pipe)
            for _ in range(per_rank_batches):
                next(it)
            pipe.close()
            draws[rank] = list(ds.calls[:per_rank_batches * bs])
        idx0 = {i for i, _ in draws[0]}
        idx1 = {i for i, _ in draws[1]}
        assert idx0.isdisjoint(idx1)
        assert idx0 | idx1 == set(range(n))    # one full epoch, covered
        seeds0 = [s for _, s in draws[0]]
        seeds1 = [s for _, s in draws[1]]
        assert seeds0 != seeds1                # per-rank jitter streams

    def test_uneven_dataset_keeps_ranks_epoch_aligned(self):
        """len % num_replicas != 0: the permutation is truncated to equal
        per-rank shards (drop_last parity) so ranks advance epochs in
        lockstep — an uneven split would pair batches from different
        permutations and re-expose an image on two hosts in one step."""
        from pggan_tpu.data.pipeline import DataPipeline
        n, bs, R = 35, 8, 2                  # 35 → truncate to 34 → 17/17
        per_rank_batches = 2                  # 17//8 = 2 per epoch per rank
        draws = {}
        for rank in (0, 1):
            ds = _RecordingDataset(n)
            pipe = DataPipeline(ds, bs, num_workers=1, prefetch_depth=1,
                                seed=5, rank=rank, num_replicas=R)
            it = iter(pipe)
            for _ in range(per_rank_batches):
                next(it)
            pipe.close()
            draws[rank] = [i for i, _ in ds.calls[:per_rank_batches * bs]]
        assert set(draws[0]).isdisjoint(set(draws[1]))
        assert len(draws[0]) == len(draws[1]) == per_rank_batches * bs

    def test_grain_ranks_draw_disjoint_migrating_shards(self):
        """Grain backend: shared-seed shuffle + lazy slice — disjoint
        per-epoch shards that MIGRATE between ranks across epochs
        (DistributedSampler semantics, not a static split)."""
        pytest.importorskip("grain")
        from pggan_tpu.data.grain_pipeline import GrainPipeline
        n, bs = 16, 8
        epochs = {}
        for rank in (0, 1):
            ds = _RecordingDataset(n)
            pipe = GrainPipeline(ds, bs, num_workers=1, prefetch_depth=1,
                                 seed=11, rank=rank, num_replicas=2)
            it = iter(pipe)
            next(it)                           # epoch 0 (8 = n/2 per rank)
            next(it)                           # epoch 1
            pipe.close()
            calls = [i for i, _ in ds.calls[:2 * bs]]
            epochs[rank] = (set(calls[:bs]), set(calls[bs:2 * bs]))
        for e in (0, 1):
            assert epochs[0][e].isdisjoint(epochs[1][e])
            assert epochs[0][e] | epochs[1][e] == set(range(n))
        # migration: epoch 1's rank-0 shard differs from epoch 0's
        assert epochs[0][0] != epochs[0][1]


class TestAllProcessEvalHooks:
    def test_validation_runs_on_non_master(self, tmp_path, monkeypatch):
        # multi-host safety: validation is an SPMD eval that EVERY process
        # must enter (a master-only call would deadlock the collective) —
        # so a non-master trainer must still execute it, just not log
        cfg = smoke_cfg(tmp_path, use_validation=True)
        trainer = create_model(cfg)
        calls = {"n": 0}
        orig = trainer.validation

        def spy(step):
            calls["n"] += 1
            return orig(step)

        trainer.validation = spy
        trainer.is_master = False
        trainer.logger = None
        try:
            trainer.fit("nonmaster", max_step=5)
        finally:
            trainer.close()
        assert calls["n"] >= 2          # test_cycle=2 → steps 0,2,4
        import os
        assert not os.path.exists(
            os.path.join(cfg.save_root, "nonmaster", "metrics.jsonl"))

    def test_fid_runs_on_non_master(self, tmp_path):
        cfg = smoke_cfg(tmp_path, fid_cycle=2, fid_samples=8)
        trainer = create_model(cfg)
        trainer.is_master = False
        trainer.logger = None
        try:
            trainer.fit("nonmaster_fid", max_step=3)
            fid = trainer.compute_fid(num_samples=8)
            assert np.isfinite(fid)
        finally:
            trainer.close()
