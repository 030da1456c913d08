"""Device-resident dataset cache: the input pipeline's HBM fast path.

Motivation (round 4, measured on the marquee 1024² run): a per-step host
batch at 512²/1024² is 12–25 MB of uint8, and on a remotely-attached
chip the host→device transfer runs at ~25-30 MB/s — at 512² the transfer
(~500 ms) DOMINATES the 235 ms device step, collapsing end-to-end
throughput to ~0.45× of the device's own rate (BASELINE.md round 4).
The reference never faces this shape (its DataLoader feeds a local GPU,
`lib/model.py:50-52`) — a TPU-native pipeline solves it the TPU way:

  * the UNAUGMENTED resized-at-scale dataset is uploaded to HBM ONCE per
    scale (29-image demo set at 1024²: 91 MB — trivia next to 16 GB);
  * each training batch then ships only int32 indices + per-sample
    augmentation parameters (a few hundred BYTES), and the batch is
    assembled in-graph: gather → flip → color jitter, one tiny XLA
    program whose output is already laid out on the `data` mesh axis.

Parameter sampling is byte-identical to the host backends: the pipeline
draws the same per-sample seeds, and `data/augment.py` consumes each
seed's RandomState in the same fixed order, so WHICH images, WHICH flips
and WHICH jitter factors a step sees do not depend on the backend. The
jitter arithmetic mirrors the native C++ chain (`native/loader.cpp:253-347`:
float pipeline, per-op clamp to [0,255], luma = .299/.587/.114, HSV hue
rotation, single final round) — like native-vs-PIL, device-vs-native is
distributionally equivalent with per-pixel deltas of ≤1-2 LSB from f32
associativity; with augmentation off the path is BIT-exact
(integers round-trip f32 exactly). Tested in tests/test_device_cache.py.

Scope: single-process meshes (any device count — the gather/augment
program is GSPMD-sharded on its batch axis). Multi-host feeds
process-local shards from host memory (`data/pipeline.py`).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from pggan_tpu.data.augment import DEFAULT_JITTER, draw_augment_params


def _lum(x):
    """ITU-R 601-2 luma, the native loader's gray (`loader.cpp:261,271`)."""
    return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]


def _brightness(x, f):
    import jax.numpy as jnp
    return jnp.clip(x * f, 0.0, 255.0)


def _contrast(x, f):
    import jax.numpy as jnp
    m = jnp.mean(_lum(x), axis=(1, 2), keepdims=True)[..., None]
    return jnp.clip(f * x + (1.0 - f) * m, 0.0, 255.0)


def _saturation(x, f):
    import jax.numpy as jnp
    g = _lum(x)[..., None]
    return jnp.clip(f * x + (1.0 - f) * g, 0.0, 255.0)


def _hue(x, shift):
    """HSV hue rotation by `shift` turns (`loader.cpp:278-318`)."""
    import jax.numpy as jnp
    r, g, b = x[..., 0] / 255.0, x[..., 1] / 255.0, x[..., 2] / 255.0
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    sd = jnp.where(d > 0.0, d, 1.0)          # avoid 0/0 under where
    # Branch on DIRECT channel comparisons, not `mx == r`: XLA fusion may
    # recompute a producer per consumer with ±1 ulp skew, making a
    # max-equality match NO branch and falling through to the wrong
    # sector formula (a ~140-LSB discontinuity, caught by the golden
    # test). Near-tie misclassification under >= is harmless — the
    # sector formulas agree continuously at ties (`loader.cpp:286-291`
    # computes once on the CPU, so its == chain never faces this).
    is_r = (r >= g) & (r >= b)
    is_g = jnp.logical_not(is_r) & (g >= b)
    h = jnp.where(
        is_r, jnp.mod((g - b) / sd, 6.0),
        jnp.where(is_g, (b - r) / sd + 2.0, (r - g) / sd + 4.0)) / 6.0
    h = jnp.where(d > 0.0, h, 0.0)
    s = jnp.where(mx > 0.0, d / jnp.where(mx > 0.0, mx, 1.0), 0.0)
    v = mx
    h = h + shift[..., 0]
    h = h - jnp.floor(h)
    hh = h * 6.0
    sector = jnp.floor(hh).astype(np.int32) % 6
    frac = hh - jnp.floor(hh)
    p = v * (1.0 - s)
    q = v * (1.0 - s * frac)
    t = v * (1.0 - s * (1.0 - frac))
    nr = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3,
                     sector == 4], [v, q, p, p, t], v)
    ng = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3,
                     sector == 4], [t, v, v, q, p], p)
    nb = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3,
                     sector == 4], [p, p, t, v, v], q)
    out = jnp.stack([nr, ng, nb], axis=-1) * 255.0
    return jnp.clip(out, 0.0, 255.0)


def assemble_batch(data, idx, flip, factors, order):
    """[N,s,s,3] u8 cache + per-sample params -> [B,s,s,3] u8 batch.

    Gather, horizontal flip, then the four jitter ops in each sample's
    drawn order (`loader.cpp:320-347`): position k applies op `order[:,k]`
    where that op's factor sentinel enables it, via select — disabled ops
    keep the ORIGINAL values bit-exactly (no identity arithmetic)."""
    import jax.numpy as jnp
    x = jnp.take(data, idx, axis=0).astype(jnp.float32)
    x = jnp.where(flip[:, None, None, None] > 0, x[:, :, ::-1, :], x)
    fb = factors[:, 0][:, None, None, None]
    fc = factors[:, 1][:, None, None, None]
    fs = factors[:, 2][:, None, None, None]
    fh = factors[:, 3][:, None, None, None]
    gates = (factors[:, 0] >= 0.0, factors[:, 1] >= 0.0,
             factors[:, 2] >= 0.0, factors[:, 3] > -1.0)
    for k in range(4):
        op = order[:, k]
        outs = (_brightness(x, fb), _contrast(x, fc),
                _saturation(x, fs), _hue(x, fh))
        for j in range(4):
            sel = (op == j) & gates[j]
            x = jnp.where(sel[:, None, None, None], outs[j], x)
    # lround semantics (`loader.cpp:346`): x >= 0 here, so floor(x+.5)
    # == round-half-away (jnp.round would round half-to-even)
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0).astype(jnp.uint8)


class DeviceDataCache:
    """Uploads a dataset's resized-at-scale images to HBM once and
    assembles augmented batches in-graph (module docstring)."""

    def __init__(self, dataset, mesh, *, augment: Optional[bool] = None,
                 jitter: Tuple[float, float, float, float] = DEFAULT_JITTER):
        import jax
        from pggan_tpu.parallel.mesh import batch_sharding, replicated_sharding
        self.mesh = mesh
        self.augment = bool(dataset.augment if augment is None else augment)
        self.jitter = jitter
        self.n_images = len(dataset.paths)
        host = np.stack([dataset.resized_array(i)
                         for i in range(self.n_images)])
        self.nbytes = host.nbytes
        self.data = jax.device_put(host, replicated_sharding(mesh))
        # training batches divide the mesh (shard_batch invariant) and land
        # pre-sharded on the data axis; odd-sized eval batches replicate
        self._fn = jax.jit(assemble_batch,
                           out_shardings=batch_sharding(mesh))
        self._fn_rep = jax.jit(assemble_batch,
                               out_shardings=replicated_sharding(mesh))
        self._mesh_size = mesh.devices.size

    def assemble(self, idxs: Sequence[int], seeds: Sequence[int]):
        """Device batch for pipeline-drawn (indices, per-sample seeds) —
        the drop-in replacement for decode+`shard_fn` in
        `DataPipeline._producer`. Returns an async device array; the
        transfer this dispatch replaces was the e2e bottleneck."""
        idxs = np.asarray(idxs, np.int32) % np.int32(self.n_images)
        flips = np.empty(len(idxs), np.int32)
        factors = np.empty((len(idxs), 4), np.float32)
        orders = np.empty((len(idxs), 4), np.int32)
        for i, s in enumerate(seeds):
            fl, fa, od = draw_augment_params(
                np.random.RandomState(int(s)), self.jitter, self.augment)
            flips[i], factors[i], orders[i] = fl, fa, od
        fn = self._fn if len(idxs) % self._mesh_size == 0 else self._fn_rep
        return fn(self.data, idxs, flips, factors, orders)


def resolve_device_data_cache(cfg, dataset, mesh) -> bool:
    """Gate for `device_data_cache` ('auto' | True | False).

    'auto' requires: a single-process mesh, a dataset exposing
    `resized_array` (ImageFolderDataset), and the whole resized dataset
    fitting `device_cache_mb`. An explicit True raises on an unmet
    requirement instead of silently falling back."""
    import jax
    mode = cfg["device_data_cache"] if "device_data_cache" in cfg else False
    if mode is False or mode is None or mode == "false":
        return False
    multiproc = jax.process_count() > 1
    has_arrays = hasattr(dataset, "resized_array")
    nbytes = (len(dataset) * dataset.resolution ** 2 * 3
              if has_arrays else 0)
    budget = int(cfg["device_cache_mb"]
                 if "device_cache_mb" in cfg else 256) << 20
    ok = not multiproc and has_arrays and nbytes <= budget
    if mode == "auto":
        return ok
    if not ok:
        raise ValueError(
            "device_data_cache=true requires a single-process mesh, an "
            "ImageFolderDataset, and the resized dataset within "
            f"device_cache_mb ({nbytes >> 20} MB vs {budget >> 20} MB)")
    return True
