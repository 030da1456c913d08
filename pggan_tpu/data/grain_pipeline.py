"""Grain-backed data pipeline (alternative backend).

The BASELINE north star names Grain as the idiomatic TPU input stack
("the per-scale 2**(scale_index+2) resize/normalize dataset path becomes a
prefetching Grain/tf.data loader"). This backend wraps the same dataset
objects as the thread-pool pipeline (`data/pipeline.py`) in a
`grain.MapDataset` graph: infinite epochs via `.repeat()`, per-record
seeded augmentation, drop-remainder batching, and worker prefetch through
`.mp_prefetch`/`to_iter_dataset`. Select with `data_backend_impl: grain`.

Both backends expose the same iterator contract (uint8 NHWC batches +
optional shard_fn), so the trainer is backend-agnostic.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

import grain


class GrainPipeline:
    def __init__(self, dataset, batch_size: int, *,
                 indices: Optional[Sequence[int]] = None,
                 num_workers: int = 8, prefetch_depth: int = 2,
                 seed: int = 42, shard_fn=None,
                 rank: int = 0, num_replicas: int = 1,
                 start_batch: int = 0):
        assert 0 <= int(rank) < int(num_replicas)
        self.shard_fn = shard_fn
        indices = list(indices) if indices is not None \
            else list(range(len(dataset)))
        if len(indices) < batch_size * num_replicas:
            reps = -(-batch_size * num_replicas // len(indices))
            indices = indices * reps
        # Multi-host: the shared-seed SHUFFLE runs over the full list and
        # each rank takes every num_replicas-th element of the shuffled
        # view (slices compose lazily and the per-epoch reshuffle flows
        # through them) — DistributedSampler semantics, same as
        # DataPipeline: disjoint per-epoch shards that migrate between
        # ranks. The shuffled view is first TRUNCATED to a multiple of
        # num_replicas (drop_last parity with DataPipeline._producer):
        # without it, len % R leftover items give some ranks longer
        # epochs, ranks drift out of epoch alignment, and the same image
        # can be drawn on two hosts in one global step. Per-record
        # augmentation seeds fold the rank.
        rank, num_replicas = int(rank), int(num_replicas)
        rec_base = (seed + 1 + 1_000_003 * rank) % (2**31 - 1)
        n_even = len(indices) - len(indices) % num_replicas

        def load(args):
            index, rec_seed = args
            return dataset.get(int(index),
                               np.random.RandomState(int(rec_seed)))

        base = (
            grain.MapDataset.source(indices)
            .seed(seed)                                 # SHARED across ranks
            .shuffle()[:n_even][rank::num_replicas]
            .repeat()                                   # infinite epochs
            .map_with_index(lambda i, idx: (idx, (rec_base * 48271 + i)
                                            % (2 ** 31 - 1)))
            .map(load)
            .batch(batch_size, drop_remainder=True)
        )
        if start_batch:
            # exact-resume fast-forward (DataPipeline start_batch parity):
            # every record's position-keyed seed makes the stream a pure
            # function of global batch index, so a lazy slice IS the
            # fast-forward — no records are loaded for the skipped prefix
            base = base[int(start_batch):]
        it = base.to_iter_dataset(
            grain.ReadOptions(num_threads=max(1, num_workers),
                              prefetch_buffer_size=max(1, prefetch_depth)
                              * batch_size))
        self._iter = iter(it)

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        batch = np.asarray(next(self._iter))
        if self.shard_fn is not None:
            batch = self.shard_fn(batch)
        return batch

    def close(self):
        # Grain's iterator owns reader threads / prefetch buffers; release
        # them deterministically instead of leaving them to process exit.
        it, self._iter = self._iter, None
        if it is not None:
            for attr in ("close", "stop"):
                fn = getattr(it, attr, None)
                if callable(fn):
                    try:
                        fn()
                    except Exception:
                        pass
                    break
            del it
        import gc
        gc.collect()        # drop reader threads referenced only by `it`

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
