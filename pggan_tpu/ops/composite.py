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
from pggan_tpu.ops.resample import upfirdn2d


def filtered_lrelu(x: jax.Array, fu: Optional[jax.Array] = None,
                   fd: Optional[jax.Array] = None,
                   b: Optional[jax.Array] = None, *, up: int = 1,
                   down: int = 1, padding=0, gain: float = 2 ** 0.5,
                   slope: float = 0.2, clamp: Optional[float] = None,
                   impl: str = "xla") -> jax.Array:
    """bias → up-filter → leaky-relu(+gain/clamp) → down-filter, NHWC.

    Matches the reference op's pipeline and RAW padding semantics
    (`filtered_lrelu.py:56-116` / `_filtered_lrelu_ref`): bias is added
    BEFORE upsampling (a constant bias is not preserved through
    zero-insertion filtering, so order matters), `padding` is applied
    around the upsample stage exactly as given (int or [x0,x1,y0,y1] —
    no automatic filter centering; output side = (in·up + px0 + px1 −
    fu_w)/1 + 1 before the down stage), and the up stage carries the up²
    magnitude gain.
    """
    if b is not None:
        x = x + b.reshape((1,) * (x.ndim - 1) + (-1,)).astype(x.dtype)
    px = padding if isinstance(padding, int) else max(abs(p) for p in padding)
    if up > 1 or fu is not None or px:
        x = upfirdn2d(x, fu, up=up, padding=padding, gain=float(up * up))
    x = bias_act(x, None, act="lrelu", alpha=slope, gain=gain, clamp=clamp,
                 impl=impl)
    if down > 1 or fd is not None:
        x = upfirdn2d(x, fd, down=down)
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
    from pggan_tpu.ops.resample import downsample2d, upsample2d

    if not flip_weight:
        w = jnp.flip(w, axis=(0, 1))

    if up > 1:
        # centered filtered upsample (shared with resample.upsample2d —
        # one copy of the filter-centering arithmetic)
        x = upsample2d(x, f, up=up, padding=padding)
        padding = 0

    stride = down if (down > 1 and f is None) else 1
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if down > 1 and f is not None:
        y = downsample2d(y, f, down=down)
    return y


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
