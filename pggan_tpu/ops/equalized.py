"""Equalized-learning-rate convolution / linear layers (functional).

Reference semantics (`lib/layers.py:17-109`): weights are initialized to
N(0, 1) (divided by `lr_mul`) and He's constant `sqrt(2 / fan_in) * lr_mul`
is multiplied **at runtime**, equalizing the effective learning rate across
layers of different fan-in. Bias is zero-initialized when
`init_bias_to_zero` (`lib/layers.py:51-52`).

fan_in follows the torch weight layout `[out, in, kh, kw]` → prod(size[1:])
= in * kh * kw (`lib/layers.py:22-25`); linear fan_in = in_features.

Here weights are stored HWIO (convs) / [in, out] (linear), NHWC activations.
The runtime constant is folded into the conv by scaling the *input* (one
fused multiply that XLA folds into the preceding op) rather than
materializing a scaled weight tensor — same math, less HBM traffic.

When `equalized_lr=False` the reference falls back to torch's default
kaiming-uniform init with no runtime scale; we mirror that with He-normal
init and scale 1.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def he_constant(fan_in: int, lr_mul: float = 1.0) -> float:
    """He's constant sqrt(2 / fan_in) * lr_mul (`lib/layers.py:18-26`)."""
    return math.sqrt(2.0 / fan_in) * lr_mul


def init_conv_params(rng: jax.Array, in_ch: int, out_ch: int, kernel: int,
                     *, equalized: bool = True, lr_mul: float = 1.0,
                     init_bias_to_zero: bool = True,
                     dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Conv params {w: [kh, kw, in, out], b: [out], scale: python float}."""
    k_w, k_b = jax.random.split(rng)
    shape = (kernel, kernel, in_ch, out_ch)
    fan_in = in_ch * kernel * kernel
    if equalized:
        w = jax.random.normal(k_w, shape, dtype) / lr_mul
        scale = he_constant(fan_in, lr_mul)
    else:
        w = jax.random.normal(k_w, shape, dtype) * math.sqrt(2.0 / fan_in)
        scale = 1.0
    if init_bias_to_zero:
        b = jnp.zeros((out_ch,), dtype)
    else:
        bound = 1.0 / math.sqrt(fan_in)
        b = jax.random.uniform(k_b, (out_ch,), dtype, -bound, bound)
    return {"w": w, "b": b, "scale": jnp.asarray(scale, dtype)}


def init_linear_params(rng: jax.Array, in_dim: int, out_dim: int,
                       *, equalized: bool = True, lr_mul: float = 1.0,
                       init_bias_to_zero: bool = True,
                       dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Linear params {w: [in, out], b: [out], scale: python float}."""
    k_w, k_b = jax.random.split(rng)
    if equalized:
        w = jax.random.normal(k_w, (in_dim, out_dim), dtype) / lr_mul
        scale = he_constant(in_dim, lr_mul)
    else:
        w = jax.random.normal(k_w, (in_dim, out_dim), dtype) * math.sqrt(2.0 / in_dim)
        scale = 1.0
    if init_bias_to_zero:
        b = jnp.zeros((out_dim,), dtype)
    else:
        bound = 1.0 / math.sqrt(in_dim)
        b = jax.random.uniform(k_b, (out_dim,), dtype, -bound, bound)
    return {"w": w, "b": b, "scale": jnp.asarray(scale, dtype)}


def equalized_conv2d(params: Dict[str, jax.Array], x: jax.Array, *,
                     padding: str = "SAME",
                     compute_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """NHWC conv with the He constant applied at runtime.

    Reference applies the constant to the conv *output*
    (`lib/layers.py:58-62`: x = conv(x); x *= scale — note the scale also
    hits the bias there because torch's conv adds bias inside). We match
    that exactly: (conv(x, w) + b) * scale.
    """
    w, b = params["w"], params["b"]
    # The He constant is a runtime CONSTANT (`lib/layers.py:56` keeps it a
    # plain float attribute, never a Parameter). It lives in the pytree for
    # checkpoint round-tripping only — stop_gradient keeps value_and_grad +
    # Adam from silently training it, which would defeat equalized LR.
    scale = jax.lax.stop_gradient(params["scale"])
    dt = compute_dtype or x.dtype
    # MXU accumulates bf16 matmuls in f32 internally; forcing an f32 output
    # via preferred_element_type breaks the conv transpose rule under
    # grad-of-grad (f32 cotangent vs bf16 kernel), so only pin it when the
    # compute dtype is already f32.
    pref = jnp.float32 if dt == jnp.float32 else None
    # The reference computes (conv(x, w) + b) · c (`lib/layers.py:58-62`).
    # Algebraically identical: conv(x, w·c) + b·c — the He constant then
    # touches only the (tiny) weight tensor instead of a full activation
    # map per conv. Scaling in f32 BEFORE the bf16 cast also preserves a
    # bit of precision.
    w = (w.astype(jnp.float32) * scale).astype(dt)
    b = (b.astype(jnp.float32) * scale).astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        x.astype(dt), w,
        window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pref,
    )
    return (y + b.astype(y.dtype)).astype(dt)


def equalized_linear(params: Dict[str, jax.Array], x: jax.Array, *,
                     compute_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """[B, in] @ [in, out] with runtime He constant: (x @ w + b) * scale."""
    w, b = params["w"], params["b"]
    scale = jax.lax.stop_gradient(params["scale"])   # fixed constant, see above
    dt = compute_dtype or x.dtype
    pref = jnp.float32 if dt == jnp.float32 else None
    w = (w.astype(jnp.float32) * scale).astype(dt)
    b = (b.astype(jnp.float32) * scale).astype(jnp.float32)
    y = jnp.dot(x.astype(dt), w, preferred_element_type=pref)
    return (y + b.astype(y.dtype)).astype(dt)
