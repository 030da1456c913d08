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


class DataPipeline:
    def __init__(self, dataset, batch_size: int, *,
                 indices: Optional[Sequence[int]] = None,
                 num_workers: int = 8, prefetch_depth: int = 2,
                 seed: int = 42, shard_fn=None):
        """`batch_size` is the per-host batch. `shard_fn(np_batch)` may
        device_put with a NamedSharding; it runs on the prefetch thread."""
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.indices = np.asarray(indices if indices is not None
                                  else np.arange(len(dataset)))
        if len(self.indices) < self.batch_size:
            # small datasets: sample with replacement rather than starving
            reps = -(-self.batch_size // len(self.indices))
            self.indices = np.tile(self.indices, reps)
        self.num_workers = max(1, int(num_workers))
        self.prefetch_depth = max(1, int(prefetch_depth))
        self.seed = seed
        self.shard_fn = shard_fn
        self._queue: queue.Queue = queue.Queue(maxsize=self.prefetch_depth)
        self._stop = threading.Event()
        self._pool = ThreadPoolExecutor(max_workers=self.num_workers,
                                        thread_name_prefix="pggan-data")
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    # -- producer ------------------------------------------------------------
    def _producer(self):
        epoch = 0
        rng_master = np.random.RandomState(self.seed)
        while not self._stop.is_set():
            order = rng_master.permutation(len(self.indices))
            n_batches = len(order) // self.batch_size   # drop_last
            for b in range(max(n_batches, 1)):
                if self._stop.is_set():
                    return
                sel = order[b * self.batch_size:(b + 1) * self.batch_size]
                if len(sel) < self.batch_size:          # tiny dataset fallback
                    sel = np.concatenate([sel, order[:self.batch_size - len(sel)]])
                idxs = self.indices[sel]
                seeds = rng_master.randint(0, 2**31 - 1, size=len(idxs))
                futures = [
                    self._pool.submit(self.dataset.get, int(i),
                                      np.random.RandomState(int(s)))
                    for i, s in zip(idxs, seeds)
                ]
                try:
                    batch = np.stack([f.result() for f in futures])
                except Exception as exc:
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
