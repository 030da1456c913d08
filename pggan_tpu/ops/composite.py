"""Composite resampling ops — filtered_lrelu / conv2d_resample /
grid_sample analogs.

Capability parity with the remaining vendored NVIDIA ops
(`submodel/stylegan2/torch_utils/ops/`):

  * filtered_lrelu (`filtered_lrelu.py:56-116`): upsample-filter → bias →
    leaky-relu (+gain/clamp) → downsample-filter. The CUDA version fuses
    all stages and packs activation signs into a bit buffer for the
    backward (`:197-228`); on TPU the pipeline is expressed as upfirdn2d +
    bias_act and XLA fuses the elementwise middle into the convolutions —
    the sign-buffer trick is replaced by recompute-friendly autodiff
    (rematerialization beats an extra HBM round-trip on TPU).
  * conv2d_resample (`conv2d_resample.py:46-141`): convolution with
    integrated up/down resampling and optional FIR filtering. The
    reference hand-selects fast paths (1×1, strided, transposed); here a
    single `lax.conv_general_dilated` expresses stride/dilation natively
    and XLA picks the kernels.
  * grid_sample (`grid_sample_gradfix.py:26-77`): bilinear grid sampling
    that is differentiable to any order — `map_coordinates` composes with
    jax.grad natively, so the reference's custom second-order autograd
    dissolves.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pggan_tpu.ops.basic import bias_act
from pggan_tpu.ops.resample import _parse_padding, upfirdn2d


def filtered_lrelu(x: jax.Array, fu: Optional[jax.Array] = None,
                   fd: Optional[jax.Array] = None,
                   b: Optional[jax.Array] = None, *, up: int = 1,
                   down: int = 1, padding=0, gain: float = 2 ** 0.5,
                   slope: float = 0.2, clamp: Optional[float] = None,
                   impl: str = "xla") -> jax.Array:
    """up-filter → bias+leaky-relu(+gain/clamp) → down-filter, NHWC.

    Argument semantics follow the reference op (`filtered_lrelu.py:56-116`):
    `fu`/`fd` are the up/down FIR filters (None → box/identity per
    upfirdn2d conventions), `padding` as int or [x0,x1,y0,y1].
    """
    px0, px1, py0, py1 = _parse_padding(padding)
    if up > 1:
        fu_h = 1 if fu is None else fu.shape[0]
        fu_w = 1 if fu is None else fu.shape[-1]
        x = upfirdn2d(
            x, fu, up=up,
            padding=(px0 + (fu_w + up - 1) // 2, px1 + (fu_w - up) // 2,
                     py0 + (fu_h + up - 1) // 2, py1 + (fu_h - up) // 2),
            gain=float(up * up))
        px0 = px1 = py0 = py1 = 0
    x = bias_act(x, b, act="lrelu", alpha=slope, gain=gain, clamp=clamp,
                 impl=impl)
    if down > 1:
        fd_h = 1 if fd is None else fd.shape[0]
        fd_w = 1 if fd is None else fd.shape[-1]
        x = upfirdn2d(
            x, fd, down=down,
            padding=(px0 + (fd_w - down + 1) // 2, px1 + (fd_w - down) // 2,
                     py0 + (fd_h - down + 1) // 2, py1 + (fd_h - down) // 2))
    elif px0 or px1 or py0 or py1:
        x = upfirdn2d(x, None, padding=(px0, px1, py0, py1))
    return x


def conv2d_resample(x: jax.Array, w: jax.Array,
                    f: Optional[jax.Array] = None, *, up: int = 1,
                    down: int = 1, padding: int = 0,
                    groups: int = 1, flip_weight: bool = True) -> jax.Array:
    """Conv2d with optional integrated up/down sampling
    (`conv2d_resample.py:46-141`). NHWC x, HWIO w.

    up > 1: FIR-upsample (filter `f`) then convolve.
    down > 1: convolve then FIR-downsample — expressed as conv stride when
    no filter is given (the reference's strided fast path, `:110-121`).
    `flip_weight=True` applies w as correlation (torch conv semantics).
    """
    kh, kw = w.shape[0], w.shape[1]
    if not flip_weight:
        w = jnp.flip(w, axis=(0, 1))

    if up > 1:
        x = upfirdn2d(x, f, up=up, padding=_resample_pad(f, up, padding),
                      gain=float(up * up))
        padding = 0

    stride = down if (down > 1 and f is None) else 1
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if down > 1 and f is not None:
        y = upfirdn2d(y, f, down=down,
                      padding=((f.shape[-1] - down + 1) // 2,
                               (f.shape[-1] - down) // 2,
                               (f.shape[0] - down + 1) // 2,
                               (f.shape[0] - down) // 2))
    return y


def _resample_pad(f, up, padding):
    fh = 1 if f is None else f.shape[0]
    fw = 1 if f is None else f.shape[-1]
    return (padding + (fw + up - 1) // 2, padding + (fw - up) // 2,
            padding + (fh + up - 1) // 2, padding + (fh - up) // 2)


def grid_sample(x: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear grid sampling, torch `F.grid_sample(align_corners=False)`
    semantics (`grid_sample_gradfix.py:26-36`): x NHWC, grid [B, Ho, Wo, 2]
    with (x, y) in [-1, 1]. Differentiable to any order.
    """
    n, h, w, c = x.shape
    gx = (grid[..., 0] + 1.0) * (w / 2.0) - 0.5     # align_corners=False
    gy = (grid[..., 1] + 1.0) * (h / 2.0) - 0.5

    def sample_one(img, cx, cy):
        # map_coordinates expects (row, col) coordinate arrays per channel
        coords = jnp.stack([cy, cx], axis=0)
        return jax.vmap(
            lambda ch: jax.scipy.ndimage.map_coordinates(
                ch, coords, order=1, mode="constant", cval=0.0),
            in_axes=2, out_axes=2)(img)

    return jax.vmap(sample_one)(x, gx, gy)
