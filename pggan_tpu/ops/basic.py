"""Elementwise / normalization / resize primitives (NHWC layout).

Reference semantics preserved exactly (file:line cites are into
/root/reference):
  * pixel_norm        — `lib/layers.py:8-14`   x * rsqrt(mean(x^2, ch) + 1e-8)
  * upscale2d         — `lib/utils.py:106-118` nearest-neighbor repeat
  * downscale2d       — `lib/utils.py:120-124` average pool
  * minibatch_stddev  — `lib/blocks.py:204-233` subgroup-4, unbiased var,
                        sqrt(var+1e-8), mean over C,H,W, broadcast channel
  * bias_act          — `submodel/stylegan2/torch_utils/ops/bias_act.py`
                        fused bias + activation + gain + clamp (9 activations)

All ops are pure `jnp` and arbitrarily differentiable (needed for R1 /
WGAN-GP grad-of-grad). `impl='pallas'` dispatches to fused TPU kernels in
`pggan_tpu.ops.pallas_kernels` where they exist.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

# A/B probe hook for layout-copy pressure at high res (see BASELINE.md);
# it swaps the lrelu formulation for the WHOLE process — including golden-
# parity and second-order surfaces — so an invalid value must fail loudly
# here rather than silently fall through to one of the branches.
_LRELU_IMPL = os.environ.get("PGGAN_LRELU_IMPL", "where")
if _LRELU_IMPL not in ("where", "abs"):
    raise ValueError(
        f"PGGAN_LRELU_IMPL={_LRELU_IMPL!r} — must be 'where' (default, "
        f"production) or 'abs' (a·x+b·|x| benchmark probe)")


def leaky_relu(x: jax.Array, slope: float = 0.2) -> jax.Array:
    if _LRELU_IMPL == "abs":
        # a·x + b·|x| ≡ lrelu (a=(1+s)/2, b=(1-s)/2) — keeps every
        # differentiation order in mul/add/sign form (no predicate
        # tensors); A/B probe for layout-copy pressure at high res.
        return 0.5 * (1.0 + slope) * x + 0.5 * (1.0 - slope) * jnp.abs(x)
    return jnp.where(x >= 0, x, x * slope)


def blend(a: jax.Array, b: jax.Array, alpha: jax.Array) -> jax.Array:
    """(1 - alpha) * a + alpha * b — the progressive fade-in blend.

    Used in three places, matching the reference: G RGB-domain blend
    (`pggan/nets.py:156`), D feature-domain blend (`pggan/nets.py:265`), and
    the real-image fade (`pggan/model.py:221`).

    The two weights are computed in f32 and the arithmetic upcast around
    the bf16 activations: casting alpha to bf16 first quantizes the fade
    to ~2⁻⁸ steps — with the default Ntimes=400-600 cadence,
    bf16(1 − 1/600) == 1.0, so the first several alpha jumps would be
    exact no-ops and the weights would not sum to 1. The converts fuse
    into the neighboring ops; the output returns in the activation dtype.
    """
    alpha = jnp.asarray(alpha, dtype=jnp.float32)
    out = (1.0 - alpha) * a.astype(jnp.float32) + alpha * b.astype(jnp.float32)
    return out.astype(a.dtype)


def pixel_norm(x: jax.Array, eps: float = 1e-8, impl: str = "xla") -> jax.Array:
    """Pixelwise feature-vector normalization over the channel axis (last).

    Reference: `lib/layers.py:13-14` (channel axis is dim=1 there / NCHW;
    here NHWC → axis=-1). Also applied to the [B, latent] input vector.
    """
    if impl == "pallas":
        from pggan_tpu.ops import pallas_kernels as pk
        return pk.pixel_norm(x, eps)
    mean_sq = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(mean_sq + eps)


def lrelu_pixel_norm(x: jax.Array, slope: float = 0.2, eps: float = 1e-8,
                     impl: str = "xla") -> jax.Array:
    """pixel_norm(leaky_relu(x)) — the generator's conv epilogue
    (`lib/blocks.py:119-149`: every G conv is followed by LReLU then
    PixelNorm). `impl in ('pallas', 'fused')` runs the single-pass fused
    TPU kernel (first-order differentiable — generator-only, see
    ops/pallas_kernels.py); 'xla' is the pure-jnp reference chain.
    """
    if impl in ("pallas", "fused"):
        from pggan_tpu.ops import pallas_kernels as pk
        return pk.lrelu_pixel_norm(x, float(slope), float(eps))
    return pixel_norm(leaky_relu(x, slope), eps)


def upscale2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbor upscale of NHWC by an integer factor.

    Reference: `lib/utils.py:106-118` (view/expand repeat).
    """
    assert isinstance(factor, int) and factor >= 1
    if factor == 1:
        return x
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)


def downscale2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Average-pool downscale of NHWC by an integer factor.

    Reference: `lib/utils.py:120-124` (F.avg_pool2d).
    """
    assert isinstance(factor, int) and factor >= 1
    if factor == 1:
        return x
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)     # integer images: mean must not
    n, h, w, c = x.shape              # truncate (1/factor² → 0 in int)
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    # Accumulate the 2×2 window in the input dtype: jnp.mean upcasts the
    # reduce to f32, which makes XLA materialize the producer as a full
    # f32 tensor in HBM (measured around every avgpool in the R1
    # double-backward). factor² ≤ 4 terms lose nothing meaningful in bf16.
    inv = jnp.asarray(1.0 / (factor * factor), x.dtype)
    return jnp.sum(x, axis=(2, 4), dtype=x.dtype) * inv


def minibatch_stddev(x: jax.Array, subgroup_size: int = 4, eps: float = 1e-8,
                     impl: str = "xla") -> jax.Array:
    """Concatenate the minibatch-stddev channel (NHWC).

    Exact reference semantics (`lib/blocks.py:204-233`):
      subgroup = min(B, subgroup_size); if B % subgroup != 0 → subgroup = B;
      per-subgroup **unbiased** variance over the batch dim (torch.var
      default), sqrt(var + 1e-8), mean over all C,H,W per group, broadcast
      back as one extra channel. B == 1 → zero channel.

    Under data parallelism this stays device-local by construction (groups
    of 4 never straddle shard boundaries when the per-device batch is a
    multiple of 4) — matching the reference's per-GPU-local computation.
    """
    n, h, w, c = x.shape
    sg = min(n, subgroup_size)
    if n % sg != 0:
        sg = n
    if sg <= 1:
        y = jnp.zeros((n, h, w, 1), dtype=x.dtype)
        return jnp.concatenate([x, y], axis=-1)
    groups = n // sg
    if impl == "pallas":
        from pggan_tpu.ops import pallas_kernels as pk
        stat = pk.minibatch_stddev_stat(x, sg, eps)       # [G]
    else:
        xf = x.astype(jnp.float32)
        y = xf.reshape(groups, sg, h, w, c)
        var = jnp.var(y, axis=1, ddof=1)                  # unbiased, [G,H,W,C]
        std = jnp.sqrt(var + eps)
        stat = jnp.mean(std, axis=(1, 2, 3))              # [G]
    stat = jnp.repeat(stat, sg)                           # [N]
    y = jnp.broadcast_to(stat[:, None, None, None], (n, h, w, 1)).astype(x.dtype)
    return jnp.concatenate([x, y], axis=-1)


# ---------------------------------------------------------------------------
# bias_act — fused bias + activation + gain + clamp.
#
# Capability parity with the vendored NVIDIA op
# (`submodel/stylegan2/torch_utils/ops/bias_act.py:21-31` activation table).
# In JAX this is a single fusable expression; XLA fuses it into the producer
# matmul/conv, which is the TPU-native analog of the hand-written CUDA
# kernel. A Pallas version exists for the lrelu case (the only one on the
# PGGAN hot path).
# ---------------------------------------------------------------------------

_SQRT2 = math.sqrt(2.0)

_ACTIVATIONS = {
    # name: (fn(x, alpha), default_alpha, default_gain)
    "linear":   (lambda x, a: x,                              0.0, 1.0),
    "relu":     (lambda x, a: jnp.maximum(x, 0.0),            0.0, _SQRT2),
    "lrelu":    (lambda x, a: jnp.where(x >= 0, x, x * a),    0.2, _SQRT2),
    "tanh":     (lambda x, a: jnp.tanh(x),                    0.0, 1.0),
    "sigmoid":  (lambda x, a: jax.nn.sigmoid(x),              0.0, 1.0),
    "elu":      (lambda x, a: jax.nn.elu(x),                  0.0, 1.0),
    "selu":     (lambda x, a: jax.nn.selu(x),                 0.0, 1.0),
    "softplus": (lambda x, a: jax.nn.softplus(x),             0.0, 1.0),
    "swish":    (lambda x, a: jax.nn.silu(x),                 0.0, _SQRT2),
}


def bias_act(x: jax.Array, b: Optional[jax.Array] = None, *, dim: int = -1,
             act: str = "linear", alpha: Optional[float] = None,
             gain: Optional[float] = None, clamp: Optional[float] = None,
             impl: str = "xla") -> jax.Array:
    """Fused bias-add + activation + gain + clamp.

    Args mirror the reference op (`bias_act.py:52-88`): `b` is broadcast
    along `dim` (channel axis; default last for NHWC), `alpha` is the
    activation's shape parameter (lrelu slope), `gain` a post-scale,
    `clamp` an optional symmetric output clamp (>= 0).
    """
    if act not in _ACTIVATIONS:
        raise ValueError(f"unknown activation {act!r}")
    fn, def_alpha, def_gain = _ACTIVATIONS[act]
    alpha = def_alpha if alpha is None else float(alpha)
    gain = def_gain if gain is None else float(gain)

    if impl == "pallas" and act == "lrelu" and clamp is None and x.ndim >= 2:
        from pggan_tpu.ops import pallas_kernels as pk
        return pk.bias_lrelu_gain(x, b, dim=dim, slope=alpha, gain=gain)

    if b is not None:
        shape = [1] * x.ndim
        shape[dim] = b.shape[0]
        x = x + b.reshape(shape).astype(x.dtype)
    x = fn(x, alpha)
    if gain != 1.0:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        if clamp < 0:
            raise ValueError("clamp must be non-negative")
        x = jnp.clip(x, -clamp, clamp)
    return x


def fma(a: jax.Array, b: jax.Array, c: jax.Array) -> jax.Array:
    """a * b + c. Parity with `torch_utils/ops/fma.py`; XLA fuses natively."""
    return a * b + c
