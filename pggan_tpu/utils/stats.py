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


def psum_report(name: str, value, axis_name: str):
    """Device-side variant for use INSIDE a shard_map/pmap region: returns
    the psum'd value; call `report(name, result)` on the host after. The
    all_reduce the reference does eagerly (`training_stats.py:254-255`)
    rides ICI here."""
    return jax.lax.psum(jnp.asarray(value), axis_name)


class Collector:
    """Snapshot-and-delta view over the global counters
    (`training_stats.py:113-226`)."""

    def __init__(self, regex: str = ".*"):
        import re
        self._pattern = re.compile(regex)
        self._deltas: Dict[str, np.ndarray] = {}
        self._snapshot: Dict[str, np.ndarray] = {}

    def update(self):
        for name, moments in _counters.items():
            if not self._pattern.fullmatch(name):
                continue
            prev = self._snapshot.get(name, np.zeros(3))
            self._deltas[name] = moments - prev
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
