"""Cross-device training statistics — the `training_stats` analog.

Capability parity with the vendored NVIDIA module
(`submodel/stylegan2/torch_utils/training_stats.py`): per-name streaming
[num, sum, sum-of-squares] counters (`training_stats.py:23`), `report`
(`:56`), `report0` (`:103`), and a `Collector` exposing num/mean/std
(`:113-226`). The reference syncs across ranks with
`torch.distributed.all_reduce` (`:254-255`); here cross-device reduction
happens with `jax.lax.psum` when reporting from inside a shard_map'd or
pmapped region, and host-side accumulation is plain numpy (one process per
host — there are no ranks to sync in single-host SPMD).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

_counters: Dict[str, np.ndarray] = {}   # name → [num, sum, sum_sq] float64


def report(name: str, value) -> None:
    """Accumulate a scalar/array statistic under `name`."""
    arr = np.asarray(jax.device_get(value), dtype=np.float64).ravel()
    if arr.size == 0:
        return
    moments = np.array([arr.size, arr.sum(), np.square(arr).sum()])
    if name in _counters:
        _counters[name] = _counters[name] + moments
    else:
        _counters[name] = moments


def report0(name: str, value) -> None:
    """Report only from process 0 (`training_stats.py:103`)."""
    if jax.process_index() == 0:
        report(name, value)


def psum_moments(value, axis_name: str):
    """Device-side cross-replica moments for use INSIDE a shard_map/pmap
    region: computes the LOCAL [num, sum, sumsq] then psums the moment
    vector — exactly the reference's all_reduce of moments
    (`training_stats.py:246-255`), so `report_moments(name, result)` on
    the host yields the true cross-device mean/std. (Psumming the raw
    value and report()ing it would record a mean inflated by the device
    count.) The reduction rides ICI."""
    v = jnp.asarray(value, jnp.float32).ravel()
    local = jnp.stack([jnp.float32(v.size), jnp.sum(v),
                       jnp.sum(jnp.square(v))])
    return jax.lax.psum(local, axis_name)


def report_moments(name: str, moments) -> None:
    """Accumulate a pre-computed [num, sum, sumsq] vector (the host half
    of `psum_moments`)."""
    m = np.asarray(jax.device_get(moments), dtype=np.float64).ravel()
    assert m.shape == (3,), m.shape
    if name in _counters:
        _counters[name] = _counters[name] + m
    else:
        _counters[name] = m


class Collector:
    """Snapshot-and-delta view over the global counters
    (`training_stats.py:113-226`).

    Reference semantics preserved: the baseline snapshot is taken at
    CONSTRUCTION (`training_stats.py:130-136` — history from before the
    collector existed is excluded), and with `keep_previous=True` (the
    reference default) an update() round that saw no new reports RETAINS
    the previous round's statistics instead of going NaN
    (`training_stats.py:161-167`)."""

    def __init__(self, regex: str = ".*", keep_previous: bool = True):
        import re
        self._pattern = re.compile(regex)
        self._keep_previous = bool(keep_previous)
        self._deltas: Dict[str, np.ndarray] = {}
        self._snapshot: Dict[str, np.ndarray] = {
            name: moments.copy() for name, moments in _counters.items()
            if self._pattern.fullmatch(name)}

    def update(self):
        for name, moments in _counters.items():
            if not self._pattern.fullmatch(name):
                continue
            prev = self._snapshot.get(name, np.zeros(3))
            delta = moments - prev
            if delta[0] == 0 and self._keep_previous and name in self._deltas:
                continue                   # idle round: keep previous stats
            self._deltas[name] = delta
            self._snapshot[name] = moments.copy()

    def names(self):
        return list(self._deltas)

    def num(self, name: str) -> int:
        return int(self._deltas.get(name, np.zeros(3))[0])

    def mean(self, name: str) -> float:
        d = self._deltas.get(name)
        if d is None or d[0] == 0:
            return float("nan")
        return float(d[1] / d[0])

    def std(self, name: str) -> float:
        d = self._deltas.get(name)
        if d is None or d[0] == 0 or not np.isfinite(d[1] / d[0]):
            return float("nan")
        if d[0] == 1:
            return 0.0
        mean = d[1] / d[0]
        raw_var = d[2] / d[0]
        return float(np.sqrt(max(raw_var - mean ** 2, 0.0)))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {name: {"num": self.num(name), "mean": self.mean(name),
                       "std": self.std(name)} for name in self.names()}


def reset():
    _counters.clear()
