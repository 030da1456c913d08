"""Prefetching infinite data pipeline.

Replaces the reference's DataLoader-reiterate idiom
(`pggan/model.py:104-115`: try next / StopIteration → re-iter) with an
infinite sampler + background worker pool + bounded prefetch queue that
keeps the TPU fed:

  * worker threads decode/augment individual images (PIL releases the GIL
    for decode/resize, so threads scale; a C++ decode path can slot in
    behind `dataset.get` later)
  * batches are assembled as uint8 NHWC and (optionally) device_put with
    a `data`-axis sharding while the previous step runs — host→device
    copy overlaps compute
  * per-epoch shuffling with drop_last semantics
    (`lib/model.py:50-52`: batch_per_gpu, drop_last, 8 workers)
  * under data parallelism each host feeds only its addressable shard
    (process-local slice of the global batch)
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import numpy as np


class InfiniteSampler:
    """Endless index stream with windowed incremental shuffling — the
    `torch_utils/misc.py:111-142` InfiniteSampler, framework-free.

    Capability-parity component: DataPipeline deliberately does NOT use
    it — its per-epoch permutation + drop_last + round-robin rank shard
    reproduces the reference's DataLoader(+DistributedSampler) semantics
    (`lib/model.py:50-52`), while this class reproduces StyleGAN2's
    streaming sampler for users who want that behavior.

    Yields dataset indices forever; each yielded position is swapped with
    a random earlier position inside a sliding window (`window_size` as a
    fraction of the dataset), so the order keeps mixing without full
    re-shuffles. `rank`/`num_replicas` subsample the stream round-robin
    (the multi-replica sharding the reference sampler offers).
    """

    def __init__(self, dataset_size: int, *, rank: int = 0,
                 num_replicas: int = 1, shuffle: bool = True, seed: int = 0,
                 window_size: float = 0.5):
        assert dataset_size > 0 and num_replicas > 0
        assert 0 <= rank < num_replicas and 0 <= window_size <= 1
        self.dataset_size = int(dataset_size)
        self.rank = rank
        self.num_replicas = num_replicas
        self.shuffle = shuffle
        self.seed = seed
        self.window_size = window_size

    def __iter__(self):
        order = np.arange(self.dataset_size)
        rnd = None
        window = 0
        if self.shuffle:
            rnd = np.random.RandomState(self.seed)
            rnd.shuffle(order)
            window = int(np.rint(order.size * self.window_size))
        idx = 0
        while True:
            i = idx % order.size
            if idx % self.num_replicas == self.rank:
                yield int(order[i])
            if window >= 2:
                j = (i - rnd.randint(window)) % order.size
                order[i], order[j] = order[j], order[i]
            idx += 1


class DataPipeline:
    def __init__(self, dataset, batch_size: int, *,
                 indices: Optional[Sequence[int]] = None,
                 num_workers: int = 8, prefetch_depth: int = 2,
                 seed: int = 42, shard_fn=None, assemble_fn=None,
                 rank: int = 0, num_replicas: int = 1,
                 start_batch: int = 0):
        """`batch_size` is the per-host batch. `shard_fn(np_batch)` may
        device_put with a NamedSharding; it runs on the prefetch thread.

        Multi-host: `rank`/`num_replicas` shard each epoch's permutation
        round-robin (DistributedSampler semantics, `lib/model.py:50`) —
        the permutation is drawn from the SHARED seed so every process
        agrees on it, then each takes `order[rank::num_replicas]`, so the
        per-host batches assembled by `make_array_from_process_local_data`
        are disjoint slices of one global epoch. Per-sample augmentation
        seeds come from a per-rank stream.

        `start_batch` fast-forwards the deterministic stream: the first
        `start_batch` batches advance the permutation AND augmentation
        RNG streams exactly as real production would, but no image is
        decoded or enqueued. A resumed run passing the number of batches
        the interrupted run consumed therefore sees the IDENTICAL
        continuation of the data stream — the data-side half of exact
        resume (the checkpoint's restored `rng` key is the latent-side
        half). The reference restarts its DataLoader from scratch on
        every restart, silently replaying early-epoch images."""
        assert 0 <= int(rank) < int(num_replicas)
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.rank = int(rank)
        self.num_replicas = int(num_replicas)
        self.indices = np.asarray(indices if indices is not None
                                  else np.arange(len(dataset)))
        if len(self.indices) < self.batch_size * self.num_replicas:
            # small datasets: sample with replacement rather than starving
            reps = -(-self.batch_size * self.num_replicas // len(self.indices))
            self.indices = np.tile(self.indices, reps)
        self.num_workers = max(1, int(num_workers))
        self.prefetch_depth = max(1, int(prefetch_depth))
        self.seed = seed
        self.shard_fn = shard_fn
        # device-cache fast path (`data/device_cache.py`): when set, the
        # producer ships (indices, seeds) instead of decoded pixels — the
        # index/seed draws below are IDENTICAL either way, so the stream a
        # step sees does not depend on the backend
        self.assemble_fn = assemble_fn
        self.start_batch = max(0, int(start_batch))
        self._queue: queue.Queue = queue.Queue(maxsize=self.prefetch_depth)
        self._stop = threading.Event()
        self._pool = ThreadPoolExecutor(max_workers=self.num_workers,
                                        thread_name_prefix="pggan-data")
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    # -- producer ------------------------------------------------------------
    def _producer(self):
        epoch = 0
        skip = self.start_batch
        # permutation stream: SHARED across ranks (same seed) so the
        # round-robin shards are disjoint pieces of one global epoch;
        # augmentation stream: per-rank, so co-scheduled hosts never
        # apply identical jitter to their (distinct) samples.
        rng_master = np.random.RandomState(self.seed)
        # +1: rank 0's augmentation stream must not alias the shared
        # permutation stream (identical seeds → identical MT words)
        rng_aug = np.random.RandomState(
            (self.seed + 1 + 1_000_003 * self.rank) % (2**31 - 1))
        while not self._stop.is_set():
            order = rng_master.permutation(len(self.indices))
            # equal-length shards (DistributedSampler drop_last parity,
            # `lib/model.py:50-52`): an uneven split would let ranks
            # advance epochs at different rates, pairing batches from
            # different permutations and re-exposing the same image on
            # two hosts in one global step
            order = order[:len(order) - len(order) % self.num_replicas]
            order = order[self.rank::self.num_replicas]
            n_batches = len(order) // self.batch_size   # drop_last
            for b in range(max(n_batches, 1)):
                if self._stop.is_set():
                    return
                sel = order[b * self.batch_size:(b + 1) * self.batch_size]
                if len(sel) < self.batch_size:          # tiny dataset fallback
                    sel = np.concatenate([sel, order[:self.batch_size - len(sel)]])
                idxs = self.indices[sel]
                seeds = rng_aug.randint(0, 2**31 - 1, size=len(idxs))
                if skip > 0:
                    # fast-forward: both RNG streams advanced above with
                    # the exact draws production would make; decode nothing
                    skip -= 1
                    continue
                if self.assemble_fn is not None:
                    try:
                        batch = self.assemble_fn(idxs, seeds)
                    except Exception as exc:
                        if self._stop.is_set():
                            return
                        self._enqueue(exc)
                        return
                    self._enqueue(batch)
                    continue
                try:
                    futures = [
                        self._pool.submit(self.dataset.get, int(i),
                                          np.random.RandomState(int(s)))
                        for i, s in zip(idxs, seeds)
                    ]
                    batch = np.stack([f.result() for f in futures])
                except Exception as exc:
                    if self._stop.is_set():   # close() shut the pool down
                        return                # mid-batch — a clean exit
                    self._enqueue(exc)
                    return
                if self.shard_fn is not None:
                    try:
                        batch = self.shard_fn(batch)
                    except Exception as exc:
                        self._enqueue(exc)
                        return
                self._enqueue(batch)
            epoch += 1

    def _enqueue(self, item):
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.5)
                return
            except queue.Full:
                continue

    # -- consumer ------------------------------------------------------------
    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._queue.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        # drain so the producer unblocks
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._pool.shutdown(wait=False, cancel_futures=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
