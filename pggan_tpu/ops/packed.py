"""Space-to-depth packed execution of the highest-resolution level.

The measured 1024² ceiling (BASELINE.md): XLA's layout assignment spends
~41% of the train step in data-formatting `copy` ops around the
grad-of-grad convolutions at huge-spatial × tiny-channel shapes
([B, 1024², ≤16·ch] — the minor (lane) dimension is nearly empty, so
every fusion boundary re-tiles). The same program shape at 256² (channels
≥ 64) has <2% copy time.

Fix the SHAPE, not the schedule: run the top level in a space-to-depth
packed representation — [B, R, R, C] ⇄ [B, R/2, R/2, 4C] — where every
op of the level has an EXACT packed equivalent:

  * conv3×3 (stride 1, pad 1)  → conv3×3 on packed pixels with a
    structured [3,3,4Ci,4Co] kernel (derivation below) — 4× the executed
    MACs but at 4× the lane utilization, and crucially a lane-full shape
    XLA lays out without copies;
  * conv1×1 (fromRGB)          → block-diagonal [1,1,4Ci,4Co] kernel;
  * avgpool ×2 (downscale2d)   → a pure channel-group mean (the 4
    subpixels ARE the pool window) — lands directly in the unpacked
    next level;
  * nearest-up ×2 (upscale2d)  → channel-group broadcast;
  * lrelu / bias / blend       → unchanged (elementwise);
  * pixel_norm                 → grouped over each subpixel's original
    channel slice.

Channel-group convention is (a,b)-row-major — subpixel (row offset a,
col offset b) occupies group g = 2a + b, packed channel g·C + c — the
SAME convention as `ops/fused_scale.depth_to_space2`, so the two
families compose.

conv3×3 kernel transform: with output subpixel (a,b) at packed pixel
(i,j) reading original rows 2i+a+dy, each (a, dy) pair lands on exactly
one packed tap (u, r): a+dy = 2u+r, u ∈ {-1,0,1}, r ∈ {0,1}. Hence

  K[u+1, v+1, (r,s,ci), (a,b,co)] = w[dy+1, dx+1, ci, co]
      where dy = 2u+r-a, dx = 2v+s-b, zero outside |dy|,|dx| ≤ 1

and packed conv3×3/pad-1 over K is bit-equivalent to the original
(the padded packed row only ever contributes the original pad row; the
out-of-range row −2 has no nonzero coefficient). The transform is traced
on the tiny weight tensor inside the step; parameters stay in reference
layout (checkpoints untouched), and gradients flow through natively —
every op here is jnp, so the R1/GP grad-of-grad composes to any order.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# T[a, u, r, dy] = 1 iff a + dy == 2u + r  (indices: a∈{0,1}, u∈{0,1,2}
# meaning {-1,0,+1}, r∈{0,1}, dy∈{0,1,2} meaning {-1,0,+1})
_T = np.zeros((2, 3, 2, 3), np.float32)
for _a in (0, 1):
    for _u in (-1, 0, 1):
        for _r in (0, 1):
            _dy = 2 * _u + _r - _a
            if -1 <= _dy <= 1:
                _T[_a, _u + 1, _r, _dy + 1] = 1.0
del _a, _u, _r, _dy


def space_to_depth2(x: jax.Array) -> jax.Array:
    """[B, 2h, 2w, C] → [B, h, w, 4C], groups (a,b)-row-major (the exact
    inverse of `fused_scale.depth_to_space2`)."""
    bsz, hh, ww, c = x.shape
    x = x.reshape(bsz, hh // 2, 2, ww // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)            # B, h, w, a, b, c
    return x.reshape(bsz, hh // 2, ww // 2, 4 * c)


def pack_conv3x3_kernel(w: jax.Array) -> jax.Array:
    """[3,3,Ci,Co] → [3,3,4Ci,4Co] packed-domain kernel (module docstring
    derivation). Group order: input (r,s)-major, output (a,b)-major."""
    t = jnp.asarray(_T, w.dtype)
    # K[u,v,r,s,ci,a,b,co] = Σ_{dy,dx} T[a,u,r,dy]·T[b,v,s,dx]·w[dy,dx,ci,co]
    k = jnp.einsum("aury,bvsx,yxio->uvrsiabo", t, t, w)
    kh, kw = k.shape[0], k.shape[1]
    ci, co = w.shape[2], w.shape[3]
    return k.reshape(kh, kw, 4 * ci, 4 * co)


def pack_conv1x1_kernel(w: jax.Array) -> jax.Array:
    """[1,1,Ci,Co] → [1,1,4Ci,4Co] block-diagonal (each subpixel maps its
    own channel slice through the same 1×1 matrix)."""
    ci, co = w.shape[2], w.shape[3]
    eye = jnp.eye(4, dtype=w.dtype)
    k = jnp.einsum("gh,io->giho", eye, w[0, 0])
    return k.reshape(1, 1, 4 * ci, 4 * co)


def packed_equalized_conv2d(params: Dict[str, jax.Array], x: jax.Array, *,
                            compute_dtype=None) -> jax.Array:
    """`equalized_conv2d(params, unpack(x))` packed: (conv(x, K(w·c)) + b·c)
    with K the 3×3 or 1×1 packed transform and the bias tiled per group.
    Matches ops/equalized.py's dtype discipline (f32 weight scale, bf16-
    safe preferred_element_type)."""
    w, b = params["w"], params["b"]
    scale = jax.lax.stop_gradient(params["scale"])
    dt = compute_dtype or x.dtype
    w = w.astype(jnp.float32) * scale
    b = b.astype(jnp.float32) * scale
    if w.shape[0] == 3:
        k = pack_conv3x3_kernel(w)
    elif w.shape[0] == 1:
        k = pack_conv1x1_kernel(w)
    else:
        raise ValueError(f"unsupported packed kernel size {w.shape[:2]}")
    pad = k.shape[0] // 2
    pref = jnp.float32 if dt == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x.astype(dt), k.astype(dt), (1, 1),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pref)
    b4 = jnp.tile(b, 4)                     # group-major: b4[g·C + c] = b[c]
    return (y + b4.astype(y.dtype)).astype(dt)


def downscale2d_packed(x: jax.Array) -> jax.Array:
    """avgpool ×2 of the UNPACKED tensor ≡ mean over the 4 subpixel groups:
    [B,h,w,4C] → [B,h,w,C] (already at the next level's resolution).
    bf16-accumulating like ops/basic.downscale2d.

    Implemented as LANE-dim slices + adds, NOT a [B,h,w,4,C] group
    reshape: the 5-D reshape's minor-dim-C form made XLA assign
    minor-padded layouts and bracket every use with relayout `copy`s
    (measured 12.4 ms/step at 512², 25 ms at 1024² — trace audit,
    BASELINE.md round 3). Slices keep the tensor 4-D and lane-major."""
    c = x.shape[-1] // 4
    inv = jnp.asarray(0.25, x.dtype)
    s = x[..., :c] + x[..., c:2 * c] + x[..., 2 * c:3 * c] + x[..., 3 * c:]
    return s * inv


def upscale2d_packed(x: jax.Array) -> jax.Array:
    """nearest-neighbor ×2 upscale, emitted PACKED: [B,h,w,C] → [B,h,w,4C]
    (each subpixel group equals the source pixel). Lane-dim concat — see
    downscale2d_packed for why not a 5-D broadcast+reshape."""
    return jnp.concatenate([x, x, x, x], axis=-1)


@functools.lru_cache(maxsize=None)
def _downscale_repack_kernel_np(c: int):
    """[2,2,4C,4C] constant kernel for `space_to_depth2(downscale2d_packed
    (x))` as ONE stride-2 conv. Output packed pixel (i,j), group (a,b),
    channel c' = the pooled next-level value at pixel (2i+a, 2j+b) =
    0.25 · Σ_g x[2i+a, 2j+b, g·C+c']:
        K[dy, dx, g·C+c, (a,b)·C+c'] = 0.25 · δ(c,c') · δ((dy,dx),(a,b))
    """
    k = np.zeros((2, 2, 4 * c, 4 * c), np.float32)
    for a in (0, 1):
        for b in (0, 1):
            go = 2 * a + b
            for g in range(4):
                for ci in range(c):
                    k[a, b, g * c + ci, go * c + ci] = 0.25
    return k


def downscale2d_repack(x: jax.Array) -> jax.Array:
    """`space_to_depth2(downscale2d_packed(x))` fused: [B,h,w,4C] →
    [B,h/2,w/2,4C] — the packed input of the NEXT packed level in one
    stride-2 constant conv. Replaces the slice-sum + transpose pair at
    packed-level transitions: the conv stays lane-major end to end and
    its ~4·(4C)² MACs/output pixel are MXU noise next to the relayout
    copies the separate ops cost (trace audit, BASELINE.md round 3).
    bf16 accumulation of 4 terms matches the packed-avgpool convention."""
    c = x.shape[-1] // 4
    k = jnp.asarray(_downscale_repack_kernel_np(c), x.dtype)
    return jax.lax.conv_general_dilated(
        x, k, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.lru_cache(maxsize=None)
def _group_mean_kernel_np(c: int):
    """[1,1,4C,4C] block-diagonal 1×1 kernel: each output channel g·C+j
    receives the mean over its own group's C input channels."""
    blk = np.full((c, c), 1.0 / c, np.float32)
    k = np.kron(np.eye(4, dtype=np.float32), blk)
    return k.reshape(1, 1, 4 * c, 4 * c)


def pixel_norm_packed(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """pixel_norm over each subpixel's ORIGINAL channel slice
    ([B,h,w,4C]: normalize within each group of C).

    The group mean runs as a block-diagonal 1×1 conv so the tensor stays
    4-D and lane-full end to end — the former [B,h,w,4,C] reshape forced
    minor-dim-C layouts and relayout copies around every call (14.7
    ms/step at 512²; trace audit, BASELINE.md round 3). The constant
    kernel is f32 and the conv accumulates in f32, preserving the
    unpacked op's f32-mean numerics; the extra MACs are noise
    ((4C)² per pixel ≈ 0.1 ms at 1024²/batch 8)."""
    x32 = x.astype(jnp.float32)
    k = jnp.asarray(_group_mean_kernel_np(x.shape[-1] // 4))
    m = jax.lax.conv_general_dilated(
        x32 * x32, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (x32 * jax.lax.rsqrt(m + eps)).astype(x.dtype)
