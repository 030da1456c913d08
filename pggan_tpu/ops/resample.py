"""upfirdn2d-family resampling ops (NHWC).

Capability parity with the vendored NVIDIA op
(`submodel/stylegan2/torch_utils/ops/upfirdn2d.py`): pad → zero-insertion
upsample → FIR filter → decimate, plus the `setup_filter` / `filter2d` /
`upsample2d` / `downsample2d` wrappers. On TPU the idiomatic implementation
is a single `lax.conv_general_dilated` with `lhs_dilation` (upsample),
window stride (downsample) and explicit padding — XLA lowers this straight
onto the MXU/VPU with the zero-insertion folded into the convolution,
which is what the hand-written CUDA kernel does manually.

Everything here is arbitrarily differentiable (conv transpose rules), so
the reference's custom autograd (`upfirdn2d.py:217-273`) dissolves.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

_PadT = Union[int, Sequence[int]]


def _parse_scaling(s) -> Tuple[int, int]:
    if isinstance(s, int):
        return s, s
    sx, sy = s
    return int(sx), int(sy)


def _parse_padding(p: _PadT) -> Tuple[int, int, int, int]:
    if isinstance(p, int):
        return p, p, p, p
    p = list(p)
    if len(p) == 2:
        px, py = p
        return px, px, py, py
    x0, x1, y0, y1 = p
    return x0, x1, y0, y1


def setup_filter(f, *, normalize: bool = True, flip_filter: bool = False,
                 gain: float = 1.0, separable: Optional[bool] = None) -> jnp.ndarray:
    """Convert to a 2D float32 FIR filter (`upfirdn2d.py:70-114`).

    None → identity [1]. 1D input is outer-producted to 2D unless
    `separable` (we always densify to 2D; filters here are tiny).
    """
    if f is None:
        f = 1
    f = jnp.asarray(f, dtype=jnp.float32)
    if f.ndim == 0:
        f = f[None]
    assert f.ndim in (1, 2)
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = jnp.outer(f, f)
    if normalize:
        f = f / jnp.sum(f)
    if flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2.0))
    return f


def upfirdn2d(x: jax.Array, f: Optional[jax.Array], *, up: int = 1,
              down: int = 1, padding: _PadT = 0, flip_filter: bool = False,
              gain: float = 1.0) -> jax.Array:
    """Upsample (zero-insert), pad, FIR-filter, downsample. NHWC.

    Matches `_upfirdn2d_ref` (`upfirdn2d.py:167-211`) including the
    filter-flip convention (`upfirdn2d.py:151`): `flip_filter=False`
    (default) applies the filter as *convolution* (we pre-flip the taps so
    XLA's correlation computes a convolution), `flip_filter=True` as
    correlation.
    """
    n, h, w, c = x.shape
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)

    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    if f.ndim == 1:
        f = jnp.outer(f, f)
    fh, fw = f.shape

    # Reference applies gain * up^2 to preserve signal magnitude
    # (`upfirdn2d.py:191`, gain=up**2 in _upsample wrappers handled by
    # callers; here raw `gain` only — wrappers below add up**2).
    eff = f * gain
    if not flip_filter:
        eff = jnp.flip(eff, axis=(0, 1))
    # Depthwise kernel [fh, fw, 1, 1] with feature_group_count=C.
    kernel = jnp.tile(eff[:, :, None, None].astype(x.dtype), (1, 1, 1, c))
    kernel = kernel.reshape(fh, fw, 1, c)

    # lhs_dilation inserts zeros BETWEEN samples → size (n-1)·up+1, while
    # the reference's zero-insertion upsample appends (up-1) trailing zeros
    # per sample → size n·up (`upfirdn2d.py:184-187`). Fold the missing
    # trailing zeros into the conv's trailing padding. Negative pads are
    # crops; lax.conv supports negative explicit padding.
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(downy, downx),
        padding=((pady0, pady1 + (upy - 1)), (padx0, padx1 + (upx - 1))),
        lhs_dilation=(upy, upx),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype)


def filter2d(x: jax.Array, f: jax.Array, *, padding: _PadT = 0,
             flip_filter: bool = False, gain: float = 1.0) -> jax.Array:
    """FIR-filter NHWC, keeping resolution (`upfirdn2d.py:277-311`)."""
    fh, fw = (f.shape[0], f.shape[0]) if f.ndim == 1 else f.shape
    px0, px1, py0, py1 = _parse_padding(padding)
    # Reference split (`upfirdn2d.py:303-307`): the LEADING pad takes the
    # larger half (fw//2), the trailing the smaller ((fw-1)//2) — for
    # even-tap filters the swapped split shifts the output by one pixel.
    px0 += fw // 2
    px1 += (fw - 1) // 2
    py0 += fh // 2
    py1 += (fh - 1) // 2
    return upfirdn2d(x, f, padding=(px0, px1, py0, py1),
                     flip_filter=flip_filter, gain=gain)


def upsample2d(x: jax.Array, f: Optional[jax.Array] = None, *, up: int = 2,
               padding: _PadT = 0, flip_filter: bool = False,
               gain: float = 1.0) -> jax.Array:
    """Filtered 2x upsample (`upfirdn2d.py:313-350`)."""
    upx, upy = _parse_scaling(up)
    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    if f.ndim == 1:
        fh = fw = f.shape[0]
    else:
        fh, fw = f.shape
    px0, px1, py0, py1 = _parse_padding(padding)
    px0 += (fw + upx - 1) // 2
    px1 += (fw - upx) // 2
    py0 += (fh + upy - 1) // 2
    py1 += (fh - upy) // 2
    return upfirdn2d(x, f, up=up, padding=(px0, px1, py0, py1),
                     flip_filter=flip_filter, gain=gain * upx * upy)


def downsample2d(x: jax.Array, f: Optional[jax.Array] = None, *, down: int = 2,
                 padding: _PadT = 0, flip_filter: bool = False,
                 gain: float = 1.0) -> jax.Array:
    """Filtered 2x downsample (`upfirdn2d.py:352-387`)."""
    downx, downy = _parse_scaling(down)
    if f is None:
        f = jnp.ones((downy, downx), dtype=jnp.float32) / (downx * downy)
    if f.ndim == 1:
        fh = fw = f.shape[0]
    else:
        fh, fw = f.shape
    px0, px1, py0, py1 = _parse_padding(padding)
    px0 += (fw - downx + 1) // 2
    px1 += (fw - downx) // 2
    py0 += (fh - downy + 1) // 2
    py1 += (fh - downy) // 2
    return upfirdn2d(x, f, down=down, padding=(px0, px1, py0, py1),
                     flip_filter=flip_filter, gain=gain)


def bilinear_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with align_corners=True (corner-to-corner grid —
    torch F.interpolate semantics; jax.image.resize only does half-pixel
    centers, so this is hand-rolled as two separable 1-D lerps). Used by
    the e4e FPN merge (`submodel/e4e.py:261-278`) and BiSeNet's final
    logits upsample (`submodel/faceparser.py:206`)."""
    b, h, w, c = x.shape

    def coords(out, size):
        if out == 1 or size == 1:
            return jnp.zeros((out,)), jnp.zeros((out,), jnp.int32), \
                jnp.zeros((out,), jnp.int32)
        src = jnp.arange(out) * ((size - 1) / (out - 1))
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, size - 1)
        hi = jnp.minimum(lo + 1, size - 1)
        return src - lo, lo, hi

    fy, y0, y1 = coords(out_h, h)
    fx, x0, x1 = coords(out_w, w)
    x = x[:, y0] * (1.0 - fy)[None, :, None, None] + \
        x[:, y1] * fy[None, :, None, None]
    x = x[:, :, x0] * (1.0 - fx)[None, None, :, None] + \
        x[:, :, x1] * fx[None, None, :, None]
    return x
