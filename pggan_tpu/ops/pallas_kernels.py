"""Hand-written Pallas TPU kernels for the hot elementwise/normalization ops.

These are the TPU-native analogs of the reference's vendored CUDA kernels
(`submodel/stylegan2/torch_utils/ops/{bias_act.cu,upfirdn2d.cu}`), selected
via `impl='pallas'` — mirroring the reference's `impl='cuda'|'ref'` switch
(`bias_act.py:83-86`).

Differentiability strategy: each op is wrapped in `jax.custom_jvp` with the
JVP rule written in plain jnp. Forward (non-AD) execution runs the Pallas
kernel; any differentiated path (including the R1/WGAN-GP grad-of-grad,
which needs SECOND-order through the discriminator) traces the jnp rule —
`custom_vjp` would cap at first order. This is the recompute-friendly
analog of filtered_lrelu's sign-buffer trick (`filtered_lrelu.py:197-228`):
instead of saving a packed sign mask we recompute the mask in the backward,
which on TPU is cheaper than the extra HBM round-trip.

Honest engineering note (measured, see tests/test_pallas.py microbench):
on these shapes XLA fuses the pure-jnp versions into neighboring convs, so
`impl='xla'` is the production default; the Pallas path exists for
capability parity, as a fusion escape hatch, and as the substrate for
deeper fusions (resample+conv) in later rounds.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_view(x: jax.Array):
    """Collapse leading dims: [..., C] → [M, C]."""
    c = x.shape[-1]
    return x.reshape(-1, c), x.shape


def _pick_block_rows(m: int, c: int, dtype) -> int:
    """Rows per block: fill ~2 MB of VMEM, sublane-aligned."""
    bytes_per = jnp.dtype(dtype).itemsize
    target = (2 * 1024 * 1024) // max(1, c * bytes_per)
    bm = max(8, min(1024, target))
    # round down to the dtype's sublane multiple
    sub = 16 if dtype == jnp.bfloat16 else 8
    bm = max(sub, (bm // sub) * sub)
    return bm


# ---------------------------------------------------------------------------
# pixel_norm — x * rsqrt(mean(x^2, channel) + eps)      (lib/layers.py:8-14)
# ---------------------------------------------------------------------------

def _pixel_norm_kernel(x_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean_sq = jnp.mean(x * x, axis=-1, keepdims=True)
    o_ref[:] = (x * jax.lax.rsqrt(mean_sq + eps)).astype(o_ref.dtype)


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def pixel_norm(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    x2, shape = _row_view(x)
    m, c = x2.shape
    bm = _pick_block_rows(m, c, x2.dtype)
    out = pl.pallas_call(
        functools.partial(_pixel_norm_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((m, c), x2.dtype),
        grid=(pl.cdiv(m, bm),),
        in_specs=[pl.BlockSpec((bm, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2)
    return out.reshape(shape)


@pixel_norm.defjvp
def _pixel_norm_jvp(eps, primals, tangents):
    (x,), (dx,) = primals, tangents
    # jnp math (differentiable to any order) — the backward path never
    # touches the kernel, so R1's grad-of-grad composes.
    mean_sq = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(mean_sq + eps)
    y = x * inv
    mean_xdx = jnp.mean(x * dx, axis=-1, keepdims=True)
    dy = dx * inv - x * (inv ** 3) * mean_xdx
    return y, dy


# ---------------------------------------------------------------------------
# bias + leaky-relu + gain — the bias_act hot case      (bias_act.py:21-31)
# ---------------------------------------------------------------------------

def _bias_lrelu_kernel(x_ref, b_ref, o_ref, *, slope: float, gain: float):
    x = x_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y = jnp.where(x >= 0, x, x * slope)
    o_ref[:] = (y * gain).astype(o_ref.dtype)


def bias_lrelu_gain(x: jax.Array, b: Optional[jax.Array], dim: int = -1,
                    slope: float = 0.2,
                    gain: float = math.sqrt(2.0)) -> jax.Array:
    if dim not in (-1, x.ndim - 1):
        raise ValueError("pallas bias_lrelu_gain requires channel-last")
    if b is None:
        b = jnp.zeros((x.shape[-1],), x.dtype)
    return _bias_lrelu_core(x, b, float(slope), float(gain))


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3))
def _bias_lrelu_core(x: jax.Array, b: jax.Array, slope: float,
                     gain: float) -> jax.Array:
    x2, shape = _row_view(x)
    m, c = x2.shape
    bm = _pick_block_rows(m, c, x2.dtype)
    out = pl.pallas_call(
        functools.partial(_bias_lrelu_kernel, slope=slope, gain=gain),
        out_shape=jax.ShapeDtypeStruct((m, c), x2.dtype),
        grid=(pl.cdiv(m, bm),),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2, b.reshape(1, c))
    return out.reshape(shape)


@_bias_lrelu_core.defjvp
def _bias_lrelu_jvp(slope, gain, primals, tangents):
    x, b = primals
    dx, db = tangents
    z = x + jnp.reshape(b, (1,) * (x.ndim - 1) + (-1,)).astype(x.dtype)
    y = jnp.where(z >= 0, z, z * slope) * jnp.asarray(gain, x.dtype)
    dz = dx + jnp.reshape(db, (1,) * (x.ndim - 1) + (-1,)).astype(dx.dtype)
    dy = jnp.where(z >= 0, dz, dz * slope) * jnp.asarray(gain, dz.dtype)
    return y, dy


# ---------------------------------------------------------------------------
# lrelu + pixel_norm — the generator's conv epilogue, fused.
#
# Every G conv is followed by LReLU then PixelNorm (`lib/blocks.py:119-149`).
# XLA cannot fuse the cross-channel mean-square into the conv epilogue, so
# the unfused chain costs ~3 HBM passes over each activation (lrelu pass,
# reduce pass, scale pass) plus the same again in the backward. These two
# kernels do each direction in ONE read + ONE write.
#
# custom_vjp (NOT custom_jvp): this op is generator-only — the G update is
# plain first-order value_and_grad, and the D-phase G forward is inside
# stop_gradient — so capping at first order is safe (the SECOND-order rule
# applies to discriminator-path ops only, see ops/basic.py docstring). The
# backward recomputes lrelu/statistics from the saved pre-activation x
# instead of storing extra residuals.
# ---------------------------------------------------------------------------


def _channel_mean(v: jax.Array, c: int) -> jax.Array:
    """Per-row mean over channel groups of width `c` along the last axis.

    The kernel rows may pack `lanes // c` pixels into one 128-lane row
    (lane packing for c < 128); the mean must then reduce each c-wide
    group independently and broadcast back within the group.
    """
    lanes = v.shape[-1]
    if lanes == c:
        return jnp.mean(v, axis=-1, keepdims=True)
    groups = lanes // c
    parts = [jnp.mean(v[..., g * c:(g + 1) * c], axis=-1, keepdims=True)
             for g in range(groups)]
    return jnp.concatenate(
        [jnp.broadcast_to(p, p.shape[:-1] + (c,)) for p in parts], axis=-1)


def _lrelu_pn_fwd_kernel(x_ref, o_ref, *, c: int, slope: float, eps: float):
    x = x_ref[:].astype(jnp.float32)
    z = jnp.where(x >= 0, x, x * slope)
    ms = _channel_mean(z * z, c)
    o_ref[:] = (z * jax.lax.rsqrt(ms + eps)).astype(o_ref.dtype)


def _lrelu_pn_bwd_kernel(x_ref, g_ref, o_ref, *, c: int, slope: float,
                         eps: float):
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    z = jnp.where(x >= 0, x, x * slope)
    inv = jax.lax.rsqrt(_channel_mean(z * z, c) + eps)
    # (∂y/∂z)ᵀ g for y = z·rsqrt(mean(z²)+eps)  (symmetric operator),
    # then through lrelu'(x).
    dz = inv * g - z * (inv * inv * inv) * _channel_mean(z * g, c)
    o_ref[:] = jnp.where(x >= 0, dz, dz * slope).astype(o_ref.dtype)


def _lrelu_pn_call(kernel_fn, out_dtype, c: int, *arrays):
    # NOTE: measured on v5e at 256²: this kernel LOSES to XLA's fused
    # lrelu+reduce+scale chain (G fwd 9.6 → 12.7 ms/step; lane-packing
    # c<128 rows into 128-lane rows made it worse still, 14.7). XLA fuses
    # the lrelu into the conv epilogue and pipelines the two remaining
    # passes better than the extra kernel boundary allows. Kept for
    # capability parity behind impl='pallas' (the reference's CUDA
    # bias_act analog); production default is impl='xla'.
    x2s, shape = [], None
    for a in arrays:
        a2, shape = _row_view(a)
        x2s.append(a2)
    m, width = x2s[0].shape
    bm = _pick_block_rows(m, width, x2s[0].dtype)
    out = pl.pallas_call(
        functools.partial(kernel_fn, c=c),
        out_shape=jax.ShapeDtypeStruct((m, width), out_dtype),
        grid=(pl.cdiv(m, bm),),
        in_specs=[pl.BlockSpec((bm, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * len(x2s),
        out_specs=pl.BlockSpec((bm, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(*x2s)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def lrelu_pixel_norm(x: jax.Array, slope: float = 0.2,
                     eps: float = 1e-8) -> jax.Array:
    """pixel_norm(leaky_relu(x)) in one fused pass (channel-last)."""
    return _lrelu_pn_call(
        functools.partial(_lrelu_pn_fwd_kernel, slope=slope, eps=eps),
        x.dtype, x.shape[-1], x)


def _lrelu_pn_fwd_rule(x, slope, eps):
    return lrelu_pixel_norm(x, slope, eps), x


def _lrelu_pn_bwd_rule(slope, eps, x, g):
    return (_lrelu_pn_call(
        functools.partial(_lrelu_pn_bwd_kernel, slope=slope, eps=eps),
        x.dtype, x.shape[-1], x, g),)


lrelu_pixel_norm.defvjp(_lrelu_pn_fwd_rule, _lrelu_pn_bwd_rule)


# ---------------------------------------------------------------------------
# minibatch stddev statistic — per-subgroup unbiased std, averaged
# (lib/blocks.py:204-233). The concat stays in XLA (pure layout); the
# kernel computes the [G] statistic in one pass.
# ---------------------------------------------------------------------------

def _mb_stddev_kernel(x_ref, o_ref, *, sg: int, groups: int, eps: float):
    # One block holds the whole [N, F] tensor (N ≤ batch, F = C·H·W at the
    # 4×4 resolution — a few hundred KB); groups unroll statically.
    for g in range(groups):
        x = x_ref[pl.ds(g * sg, sg), :].astype(jnp.float32)   # [sg, F]
        mean = jnp.mean(x, axis=0, keepdims=True)
        d = x - mean
        var = jnp.sum(d * d, axis=0) / (sg - 1)   # unbiased (torch.var)
        std = jnp.sqrt(var + eps)
        o_ref[g] = jnp.mean(std)                  # scalar per group → SMEM


def _mb_stddev_stat_ref(x: jax.Array, sg: int, eps: float) -> jax.Array:
    n = x.shape[0]
    groups = n // sg
    y = x.astype(jnp.float32).reshape(groups, sg, -1)
    var = jnp.var(y, axis=1, ddof=1)
    return jnp.mean(jnp.sqrt(var + eps), axis=-1)


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2))
def minibatch_stddev_stat(x: jax.Array, subgroup_size: int = 4,
                          eps: float = 1e-8) -> jax.Array:
    """Returns the per-group statistic [G] for NHWC input (G = N // sg)."""
    n = x.shape[0]
    sg = min(n, subgroup_size)
    if n % sg != 0:
        sg = n
    assert sg > 1, "caller handles the B==1 zero-channel fallback"
    groups = n // sg
    f = int(jnp.size(x) // n)
    x2 = x.reshape(n, f)
    out = pl.pallas_call(
        functools.partial(_mb_stddev_kernel, sg=sg, groups=groups, eps=eps),
        out_shape=jax.ShapeDtypeStruct((groups,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(x2)
    return out.reshape(groups)


@minibatch_stddev_stat.defjvp
def _mb_stddev_stat_jvp(subgroup_size, eps, primals, tangents):
    (x,), (dx,) = primals, tangents
    n = x.shape[0]
    sg = min(n, subgroup_size)
    if n % sg != 0:
        sg = n
    return jax.jvp(lambda v: _mb_stddev_stat_ref(v, sg, eps), (x,), (dx,))
