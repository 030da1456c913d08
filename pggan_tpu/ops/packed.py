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
    bf16-accumulating like ops/basic.downscale2d."""
    bsz, hh, ww, c4 = x.shape
    c = c4 // 4
    v = x.reshape(bsz, hh, ww, 4, c)
    inv = jnp.asarray(0.25, x.dtype)
    return jnp.sum(v, axis=3, dtype=x.dtype) * inv


def upscale2d_packed(x: jax.Array) -> jax.Array:
    """nearest-neighbor ×2 upscale, emitted PACKED: [B,h,w,C] → [B,h,w,4C]
    (each subpixel group equals the source pixel)."""
    bsz, hh, ww, c = x.shape
    y = jnp.broadcast_to(x[:, :, :, None, :], (bsz, hh, ww, 4, c))
    return y.reshape(bsz, hh, ww, 4 * c)


def pixel_norm_packed(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """pixel_norm over each subpixel's ORIGINAL channel slice
    ([B,h,w,4C]: normalize within each group of C)."""
    bsz, hh, ww, c4 = x.shape
    v = x.reshape(bsz, hh, ww, 4, c4 // 4)
    x32 = v.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (v * inv.astype(v.dtype)).reshape(bsz, hh, ww, c4)
