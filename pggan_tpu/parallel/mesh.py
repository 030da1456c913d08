"""Device mesh + sharding for data-parallel training.

The reference's distributed layer is one process per GPU + NCCL +
DistributedSampler + DDP (`train.py:89-90`, `lib/utils.py:78-83`,
`lib/model.py:50-52,74-79`) — and its DDP wrap immediately unwraps
`.module`, so gradients are never actually synchronized
(`lib/model.py:78-79`). The TPU-native equivalent is radically simpler
and correct by construction:

  * ONE process per host; a `jax.sharding.Mesh` over all devices with a
    single `data` axis (ICI within a slice; `jax.distributed.initialize`
    extends the same code to multi-host, where DCN carries only what
    crosses slices)
  * the batch is sharded on `data`, parameters/optimizer state are
    replicated; the SAME jitted train step runs SPMD and XLA inserts the
    gradient all-reduce during the backward pass
  * `use_mGPU=True` ≙ "use every visible device"; False pins device 0

Minibatch-stddev note: its subgroup-of-4 grouping stays device-local as
long as the per-device batch is a multiple of 4 (contiguous batch shards),
matching the reference's per-GPU-local statistic.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(cfg=None, *, devices=None) -> Mesh:
    """1-D `data` mesh over the selected devices."""
    if devices is None:
        if cfg is not None and not cfg.use_mGPU:
            devices = jax.devices()[:1]
        else:
            devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with the leading axis split over `data`.

    Single-host: a plain device_put. Multi-host (process_count > 1): the
    host array is this process's LOCAL shard of the global batch, assembled
    into a global array via `make_array_from_process_local_data` — each
    host feeds only its addressable devices (the DistributedSampler
    analog, `lib/model.py:50`)."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)


def local_numpy(arr) -> np.ndarray:
    """Host view of this process's addressable portion of a (possibly
    multi-host) batch-sharded array — concatenated along the leading axis.
    Single-host fully-addressable arrays round-trip unchanged."""
    if hasattr(arr, "addressable_shards"):
        shards = sorted(arr.addressable_shards, key=lambda s: s.index[0].start or 0)
        if len(shards) > 0 and shards[0].data.shape != arr.shape:
            return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(arr)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def global_batch_size(cfg, mesh: Optional[Mesh] = None,
                      scale_index: int = 0) -> int:
    """batch_per_gpu × mesh size (`configs.yaml:35` semantics: 16 per
    device), overridable per scale via `batch_schedule` — needed at
    1024×1024 where HBM forces smaller per-device batches
    (BASELINE.json cfg #5)."""
    n_dev = mesh.size if mesh is not None else 1
    if cfg.batch_schedule:
        sched = {int(k): int(v) for k, v in dict(cfg.batch_schedule).items()}
        if scale_index in sched:
            return sched[scale_index]
    return int(cfg.batch_per_gpu) * n_dev
