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

    def test_grain_uneven_dataset_keeps_ranks_epoch_aligned(self):
        """Grain backend, len % num_replicas != 0: the shuffled view is
        trimmed to a multiple of num_replicas BEFORE the rank slice
        (drop_last parity with DataPipeline._producer) — without the trim
        grain yields 18/17 shards for n=35/R=2, ranks drift out of epoch
        alignment, and an image repeats across hosts in one global step."""
        pytest.importorskip("grain")
        from pggan_tpu.data.grain_pipeline import GrainPipeline
        n, bs, R = 35, 8, 2                 # trim 35 → 34 → 17 per rank
        per_rank_batches = 2                 # 16 of the 17-item shard
        draws = {}
        for rank in range(R):
            ds = _RecordingDataset(n)
            pipe = GrainPipeline(ds, bs, num_workers=1, prefetch_depth=1,
                                 seed=11, rank=rank, num_replicas=R)
            it = iter(pipe)
            for _ in range(per_rank_batches):
                next(it)
            pipe.close()
            draws[rank] = [i for i, _ in ds.calls[:per_rank_batches * bs]]
        assert set(draws[0]).isdisjoint(set(draws[1]))
        assert len(draws[0]) == len(draws[1]) == per_rank_batches * bs
        # both ranks read from the SAME 34-item epoch permutation: the
        # one index dropped by the trim appears on neither rank
        assert len(set(draws[0]) | set(draws[1])) == 2 * per_rank_batches * bs


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


class TestTrueMultiProcess:
    def test_two_process_training_agrees(self, tmp_path):
        """TWO real JAX processes (loopback coordinator, 4 virtual CPU
        devices each → 8-device global mesh) run the full trainer for 3
        steps and must produce bit-identical step metrics — the genuine
        `jax.distributed.initialize` + cross-process-collective path, the
        multi-process analog of the reference's torch.multiprocessing
        spawn + NCCL rendezvous (`train.py:89-90`, `lib/utils.py:78-83`).
        """
        import json as json_lib
        import os
        import socket
        import subprocess
        import sys

        from tests.conftest import require_live_jax_subprocess
        require_live_jax_subprocess()

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        worker = os.path.join(repo, "tests", "multiproc_worker.py")
        with socket.socket() as s:          # free loopback port
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        cfg = {
            "use_mGPU": True, "dataset_root_list": [],
            "save_root": str(tmp_path / "results"),
            "depths": [16, 16, 8], "latent_dim": 32,
            "batch_per_gpu": 1, "max_step": 3,
            "max_step_at_scale": [10, 10, 10],
            "alpha_jump_start": [-1, 5, 5],
            "alpha_jump_interval": [0, 2, 2],
            "alpha_jump_Ntimes": [0, 5, 5],
            "loss_cycle": 1, "test_cycle": 1000, "ckpt_cycle": 1000,
            "data_backend": "synthetic", "synthetic_dataset_size": 64,
            "num_data_workers": 2,
        }
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json_lib.dumps(cfg))
        outs = [tmp_path / f"out{r}.json" for r in (0, 1)]
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)       # worker pins cpu itself
        procs = [subprocess.Popen(
            [sys.executable, worker, str(r), "2", str(port),
             str(cfg_path), str(outs[r])],
            cwd=repo, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True) for r in (0, 1)]
        logs = [p.communicate(timeout=600)[0] for p in procs]
        if any(p.returncode != 0 for p in procs):
            tail = "\n".join(l[-2000:] for l in logs)
            if ("DISTRIBUTED" in tail.upper() or "coordinator" in tail
                    or "collective" in tail):
                pytest.skip("jax.distributed unsupported on this host:\n"
                            + tail)
            pytest.fail(f"multi-process workers failed:\n{tail}")
        recs = [json_lib.loads(o.read_text()) for o in outs]
        for r, rec in enumerate(recs):
            assert rec["process_count"] == 2
            assert rec["global_devices"] == 8
            assert rec["step"] == 3
        # SPMD over the global mesh: every process computes the SAME
        # replicated scalars — any divergence means the gradient
        # all-reduce or the rank-sharded input pipeline is broken
        assert recs[0]["metrics"].keys() == recs[1]["metrics"].keys()
        for key in recs[0]["metrics"]:
            assert recs[0]["metrics"][key] == recs[1]["metrics"][key], key
        assert all(np.isfinite(v) for v in recs[0]["metrics"].values())
