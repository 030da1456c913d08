"""LPIPS-style perceptual distance — the `submodel/lpips.py` analog.

The reference's LPIPS (`submodel/lpips.py:6-70`) is an AlexNet feature
stack with learned 1×1 channel weights loaded from a local checkpoint
(`ptnn/lpips_weights.ckpt`, `lpips.py:18-23`); it is imported by
`lib/loss.py:2` and only instantiated lazily by `Loss.get_lpips_loss`
(`lib/loss.py:65-69`) — never on the PGGAN train path.

This environment has no network egress and no bundled AlexNet weights, so
the perceptual metric here is:
  * the EXACT torchvision AlexNet `features` topology (conv paddings
    2/2/1/1/1, strides 4/1/1/1/1, biases, 3×3/2 maxpools after relu1 and
    relu2) with taps after every ReLU — real AlexNet + LPIPS weights map
    layer-for-layer;
  * per-layer unit channel normalization, learned (or unit) 1×1 weights,
    spatial mean, layer sum (exactly LPIPS's structure, `lpips.py:25-41`);
  * fixed-seed random init by default (deterministic, valid as a relative
    perceptual distance; not numerically comparable until real weights
    are loaded);
  * `load_linear_weights(path)` / `load_backbone_weights(path)` hooks for
    a local npz (keys lin0..lin4 / conv{i}_w, conv{i}_b).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class PerceptualDistance:
    # torchvision AlexNet `features` conv stack (lpips backbone)
    _WIDTHS = (64, 192, 384, 256, 256)
    _STRIDES = (4, 1, 1, 1, 1)
    _KERNELS = (11, 5, 3, 3, 3)
    _PADS = (2, 2, 1, 1, 1)
    _POOL_AFTER = (0, 1)        # 3×3/2 maxpool after relu1 and relu2

    def __init__(self, seed: int = 7, linear_weights: Optional[List[np.ndarray]] = None):
        rng = jax.random.PRNGKey(seed)
        self.backbone = []
        c_in = 3
        for i, (c_out, k) in enumerate(zip(self._WIDTHS, self._KERNELS)):
            key = jax.random.fold_in(rng, i)
            w = jax.random.normal(key, (k, k, c_in, c_out), jnp.float32)
            w = w * math.sqrt(2.0 / (k * k * c_in))
            self.backbone.append({"w": w, "b": jnp.zeros((c_out,), jnp.float32)})
            c_in = c_out
        if linear_weights is None:
            self.linear = [jnp.ones((c,), jnp.float32) / c for c in self._WIDTHS]
        else:
            self.linear = [jnp.asarray(w).reshape(-1) for w in linear_weights]

    @staticmethod
    def load_linear_weights(path: str) -> List[np.ndarray]:
        """Load per-layer 1×1 weights from a local npz (keys lin0..lin4),
        mirroring the reference's ckpt load (`lpips.py:18-23`)."""
        with np.load(path) as data:
            return [data[f"lin{i}"] for i in range(5)]

    def load_backbone_weights(self, path: str) -> "PerceptualDistance":
        """Load AlexNet conv weights from a local npz (keys conv{i}_w
        [k,k,in,out] and conv{i}_b [out], i = 0..4 — transpose torchvision
        `features.{0,3,6,8,10}.weight` from OIHW)."""
        with np.load(path) as data:
            self.backbone = [
                {"w": jnp.asarray(data[f"conv{i}_w"]),
                 "b": jnp.asarray(data[f"conv{i}_b"])}
                for i in range(5)]
        return self

    def _features(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        y = x.astype(jnp.float32)
        for i, (p, stride, pad) in enumerate(
                zip(self.backbone, self._STRIDES, self._PADS)):
            y = jax.lax.conv_general_dilated(
                y, p["w"], window_strides=(stride, stride),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]
            y = jax.nn.relu(y)
            feats.append(y)
            if i in self._POOL_AFTER:   # torch MaxPool2d(3, 2) — VALID
                y = jax.lax.reduce_window(
                    y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                    "VALID")
        return feats

    @classmethod
    def from_torch_state_dict(cls, sd) -> "PerceptualDistance":
        """Build directly from a torch `LPIPS().state_dict()` (see
        `convert_lpips_state_dict`)."""
        arrays = convert_lpips_state_dict(sd)
        self = cls(linear_weights=[arrays[f"lin{i}"] for i in range(5)])
        self.backbone = [
            {"w": jnp.asarray(arrays[f"conv{i}_w"]),
             "b": jnp.asarray(arrays[f"conv{i}_b"])}
            for i in range(5)]
        return self

    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Mean perceptual distance between NHWC batches in [-1, 1]
        (structure of `lpips.py:41-58`: unit-normalize channels, weighted
        squared diff, spatial mean, sum over layers, batch mean)."""
        total = jnp.float32(0.0)
        for fa, fb, lin in zip(self._features(a), self._features(b), self.linear):
            na = fa * jax.lax.rsqrt(jnp.sum(fa * fa, axis=-1, keepdims=True) + 1e-10)
            nb = fb * jax.lax.rsqrt(jnp.sum(fb * fb, axis=-1, keepdims=True) + 1e-10)
            d = jnp.square(na - nb)                       # [B,H,W,C]
            d = jnp.sum(d * lin.astype(d.dtype), axis=-1)  # learned 1×1
            total = total + jnp.mean(d, axis=(1, 2))      # spatial avg
        return jnp.mean(total)


# torchvision `alexnet().features` conv module indices (Sequential with
# interleaved ReLU/MaxPool), i.e. the keys inside `AlexNet.layers`
_TORCH_ALEXNET_CONV_IDX = (0, 3, 6, 8, 10)


def convert_lpips_state_dict(sd):
    """torch `LPIPS().state_dict()` (`submodel/lpips.py:6-23` — the module
    the reference fills from `ptnn/lpips_weights.ckpt`) → the npz key
    convention of `load_backbone_weights` / `load_linear_weights`:

      * `alexnet.layers.{0,3,6,8,10}.weight` OIHW → `conv{i}_w` HWIO,
        `.bias` → `conv{i}_b`
      * `lpips_weights.{i}.main.1.weight` [1,C,1,1] (a bias-free 1×1 conv,
        `lpips.py:63-70`) → `lin{i}` [C]

    `np.savez(path, **convert_lpips_state_dict(sd))` produces one file
    that both loader hooks accept.
    """
    out = {}
    for i, idx in enumerate(_TORCH_ALEXNET_CONV_IDX):
        out[f"conv{i}_w"] = np.transpose(
            np.asarray(sd[f"alexnet.layers.{idx}.weight"]), (2, 3, 1, 0))
        out[f"conv{i}_b"] = np.asarray(sd[f"alexnet.layers.{idx}.bias"])
    for i in range(5):
        out[f"lin{i}"] = np.asarray(
            sd[f"lpips_weights.{i}.main.1.weight"]).reshape(-1)
    return out
