"""Auxiliary discriminator zoo — functional JAX ports of the reference's
`submodel/discriminator.py` capability surface (all OFF the PGGAN training
path there, provided for framework completeness):

  * PatchGAN discriminator        (`submodel/discriminator.py:26-77`)
  * N-layer discriminator         (`:80-129`)
  * Multiscale discriminator      (`:132-172`)
  * StarGANv2-style discriminator (`:175-243`)
  * Latent-code MLP discriminator (`:7-23`)

All NHWC, plain-dict params, init/apply pairs in the house style. These use
standard (non-equalized) conv initialization like the reference zoo.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

from pggan_tpu.ops.basic import leaky_relu


def _conv_init(rng, in_ch, out_ch, k, dtype=jnp.float32):
    k_w, k_b = jax.random.split(rng)
    fan_in = in_ch * k * k
    w = jax.random.normal(k_w, (k, k, in_ch, out_ch), dtype) * math.sqrt(2.0 / fan_in)
    b = jnp.zeros((out_ch,), dtype)
    return {"w": w, "b": b}


def _pad_pairs(p, k):
    """torch Conv2d integer padding → symmetric XLA pad pairs. XLA "SAME"
    pads end-heavy on strided convs and keeps H for stride-1 even kernels
    (torch k=4/pad=1 shrinks by 1) — weight-ported zoo modules must use
    the reference's explicit integer paddings."""
    if p is None:
        p = k // 2
    return ((p, p), (p, p))


def _conv(p, x, *, stride=1, pad=None):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=_pad_pairs(pad, p["w"].shape[0]),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def _instance_norm(x, eps=1e-5):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


# ---------------------------------------------------------------------------
# Generic building blocks: AdaIN, ConvBlock, ResBlock, AdaINResBlock
# (`lib/utils.py:36-46` AdaIN; `lib/blocks.py:30-111`). Off the PGGAN
# training path in the reference — capability-surface parity for the
# face-swap style trainers that use them.
# ---------------------------------------------------------------------------


def _linear_init(rng, in_dim, out_dim, dtype=jnp.float32):
    k_w, _ = jax.random.split(rng)
    w = jax.random.normal(k_w, (in_dim, out_dim), dtype) * math.sqrt(1.0 / in_dim)
    return {"w": w, "b": jnp.zeros((out_dim,), dtype)}


def interpolate2d(x: jax.Array, scale_factor: float,
                  method: str = "bilinear") -> jax.Array:
    """`Interpolate` analog (`lib/blocks.py:9-18`): F.interpolate with
    bilinear mode, align_corners=False (half-pixel centers — jax.image
    semantics), no antialias (torch default)."""
    if scale_factor == 1:
        return x
    n, h, w, c = x.shape
    out = (n, int(h * scale_factor), int(w * scale_factor), c)
    return jax.image.resize(x, out, method=method, antialias=False)


def _apply_activation(x, kind: str, slope: float = 0.2):
    """`set_activate_layer` (`lib/utils.py:19-33`)."""
    if kind == "relu":
        return jax.nn.relu(x)
    if kind == "lrelu":
        return leaky_relu(x, slope)
    if kind == "tanh":
        return jnp.tanh(x)
    if kind == "sig":
        return jax.nn.sigmoid(x)
    if kind == "none":
        return x
    raise ValueError(f"Unsupported activation: {kind}")


def init_norm(rng, kind: str, dim: int):
    """`set_norm_layer` (`lib/utils.py:8-17`): 'bn' carries affine params
    (torch BatchNorm2d default), 'in'/'none' are parameter-free."""
    if kind == "bn":
        return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
    if kind in ("in", "none"):
        return {}
    raise ValueError(f"Unsupported normalization: {kind}")


def _apply_norm(p, x, kind: str, eps: float = 1e-5):
    if kind == "bn":
        # training-mode batch statistics (the reference zoo is train-only;
        # torch's running-stat eval mode would need tracked buffers)
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    if kind == "in":
        return _instance_norm(x, eps)
    return x


def init_adain(rng: jax.Array, *, style_dim: int, num_features: int
               ) -> Dict[str, Any]:
    """AdaIN (`lib/utils.py:36-46`): fc(style) → [γ, β] per channel."""
    return {"fc": _linear_init(rng, style_dim, num_features * 2)}


def adain_apply(params: Dict[str, Any], x: jax.Array, s: jax.Array
                ) -> jax.Array:
    """(1 + γ)·InstanceNorm(x) + β, with [γ ‖ β] = fc(s)
    (torch chunks channel-first: first half γ, second half β)."""
    h = s @ params["fc"]["w"] + params["fc"]["b"]
    c = x.shape[-1]
    gamma = h[:, :c][:, None, None, :]
    beta = h[:, c:][:, None, None, :]
    return (1.0 + gamma) * _instance_norm(x) + beta


def init_conv_block(rng: jax.Array, *, input_dim: int, output_dim: int,
                    kernel_size: int = 3, norm_type: str = "bn",
                    transpose: bool = False) -> Dict[str, Any]:
    """ConvBlock (`lib/blocks.py:30-56`): [upsample →] conv → norm → act."""
    k_c, k_n = jax.random.split(rng)
    return {"conv": _conv_init(k_c, input_dim, output_dim, kernel_size),
            "norm": init_norm(k_n, norm_type, output_dim)}


def conv_block_apply(params: Dict[str, Any], x: jax.Array, *,
                     stride: int = 2, padding: int = 1,
                     norm_type: str = "bn", activation_type: str = "relu",
                     transpose: bool = False) -> jax.Array:
    """transpose=True: bilinear ×stride upsample then stride-1 conv;
    else strided conv. `padding` is the torch integer padding
    (`lib/blocks.py:31` ctor default 1)."""
    if transpose:
        x = interpolate2d(x, stride)
        y = _conv(params["conv"], x, stride=1, pad=padding)
    else:
        y = _conv(params["conv"], x, stride=stride, pad=padding)
    y = _apply_norm(params["norm"], y, norm_type)
    return _apply_activation(y, activation_type)


def init_res_block(rng: jax.Array, *, in_c: int, out_c: int,
                   norm: str = "in") -> Dict[str, Any]:
    """ResBlock (`lib/blocks.py:58-85`): pre-norm residual with a 1×1
    skip; convs are bias-free like the reference."""
    ks = jax.random.split(rng, 4)
    p = {"conv1": {"w": _conv_init(ks[0], in_c, out_c, 3)["w"]},
         "conv2": {"w": _conv_init(ks[1], out_c, out_c, 3)["w"]},
         "conv1x1": {"w": _conv_init(ks[2], in_c, out_c, 1)["w"]},
         "norm1": init_norm(ks[3], norm, in_c),
         "norm2": init_norm(ks[3], norm, out_c)}
    return p


def _conv_nobias(p, x, *, stride=1, pad=None):
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=_pad_pairs(pad, p["w"].shape[0]),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def res_block_apply(params: Dict[str, Any], x: jax.Array, *,
                    scale_factor: float = 1, norm: str = "in",
                    activation: str = "lrelu") -> jax.Array:
    h = _apply_norm(params["norm1"], x, norm)
    h = _apply_activation(h, activation)
    h = _conv_nobias(params["conv1"], h)
    h = interpolate2d(h, scale_factor)
    h = _apply_norm(params["norm2"], h, norm)
    h = _apply_activation(h, activation)
    h = _conv_nobias(params["conv2"], h)
    skip = interpolate2d(_conv_nobias(params["conv1x1"], x), scale_factor)
    return h + skip


def init_adain_res_block(rng: jax.Array, *, in_c: int, out_c: int,
                         style_dim: int = 512) -> Dict[str, Any]:
    """AdaINResBlock (`lib/blocks.py:87-111`)."""
    ks = jax.random.split(rng, 5)
    return {"conv1": {"w": _conv_init(ks[0], in_c, out_c, 3)["w"]},
            "conv2": {"w": _conv_init(ks[1], out_c, out_c, 3)["w"]},
            "conv1x1": {"w": _conv_init(ks[2], in_c, out_c, 1)["w"]},
            "adain1": init_adain(ks[3], style_dim=style_dim, num_features=in_c),
            "adain2": init_adain(ks[4], style_dim=style_dim, num_features=out_c)}


def adain_res_block_apply(params: Dict[str, Any], x: jax.Array,
                          style: jax.Array, *, scale_factor: float = 1,
                          activation: str = "lrelu") -> jax.Array:
    h = adain_apply(params["adain1"], x, style)
    h = _apply_activation(h, activation)
    h = _conv_nobias(params["conv1"], h)
    h = interpolate2d(h, scale_factor)
    h = adain_apply(params["adain2"], h, style)
    h = _apply_activation(h, activation)
    h = _conv_nobias(params["conv2"], h)
    skip = interpolate2d(_conv_nobias(params["conv1x1"], x), scale_factor)
    return h + skip


# ---------------------------------------------------------------------------
# PatchGAN / N-layer discriminator (pix2pix-style)
# ---------------------------------------------------------------------------

def init_patch_discriminator(rng: jax.Array, *, input_dim: int = 3,
                             base_width: int = 64, n_layers: int = 3
                             ) -> Dict[str, Any]:
    """PatchGAN (`discriminator.py:26-77`): stride-2 conv stack with
    doubling widths, instance norm after the first layer, 1-channel
    patch-logit head."""
    layers: List[Dict] = []
    c_in, c_out = input_dim, base_width
    for i in range(n_layers):
        layers.append(_conv_init(jax.random.fold_in(rng, i), c_in, c_out, 4))
        c_in, c_out = c_out, min(c_out * 2, 512)
    layers.append(_conv_init(jax.random.fold_in(rng, 90), c_in, c_out, 4))
    head = _conv_init(jax.random.fold_in(rng, 91), c_out, 1, 4)
    return {"layers": layers, "head": head}


def patch_discriminator_apply(params: Dict[str, Any], x: jax.Array,
                              *, slope: float = 0.2, padw: int = 2,
                              get_features: bool = False):
    """Returns patch logits [B, H', W', 1] (and per-layer features).

    `padw` is the torch padding: the NLayer formula ceil((kw-1)/2)=2 for
    kw=4 (`discriminator.py:87`, the default here); the fixed PatchGAN
    variant uses padw=1 (`discriminator.py:31`)."""
    feats = []
    y = x
    for i, p in enumerate(params["layers"]):
        stride = 2 if i < len(params["layers"]) - 1 else 1
        y = _conv(p, y, stride=stride, pad=padw)
        if i > 0:
            y = _instance_norm(y)
        y = leaky_relu(y, slope)
        feats.append(y)
    out = _conv(params["head"], y, stride=1, pad=padw)
    if get_features:
        return out, feats
    return out


# ---------------------------------------------------------------------------
# Multiscale discriminator
# ---------------------------------------------------------------------------

def init_multiscale_discriminator(rng: jax.Array, *, num_scales: int = 3,
                                  input_dim: int = 3, base_width: int = 64,
                                  n_layers: int = 6) -> Dict[str, Any]:
    """One NLayer net per scale, input pooled between scales
    (`discriminator.py:132-172`). Defaults follow the reference
    (n_layers=6, num_D=3, `discriminator.py:133`). `scales[s]` corresponds
    to the torch parameter `layer{s}` — the APPLY walks them in reverse
    (`layer{num_D-1-i}` consumes the i-th downsampled input,
    `discriminator.py:163-171`), so path-wise weight mapping is direct."""
    return {"scales": [
        init_patch_discriminator(jax.random.fold_in(rng, s),
                                 input_dim=input_dim, base_width=base_width,
                                 n_layers=n_layers)
        for s in range(num_scales)]}


def _torch_avgpool3s2(x: jax.Array) -> jax.Array:
    """torch AvgPool2d(3, stride=2, padding=1, count_include_pad=False)
    (`discriminator.py:146`): 3×3 mean over VALID (non-pad) elements."""
    sums = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                                 (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                   (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    return sums / counts


def multiscale_discriminator_apply(params: Dict[str, Any], x: jax.Array,
                                   *, slope: float = 0.2) -> List[jax.Array]:
    """Returns per-scale logits in the reference's result order: entry i
    is `layer{num_D-1-i}` applied to the i-th downsampled input
    (`discriminator.py:163-171` — full resolution goes through the LAST
    per-scale net)."""
    num_d = len(params["scales"])
    outs = []
    y = x
    for i in range(num_d):
        outs.append(patch_discriminator_apply(
            params["scales"][num_d - 1 - i], y, slope=slope))
        if i != num_d - 1:
            y = _torch_avgpool3s2(y)
    return outs


# ---------------------------------------------------------------------------
# Latent-code MLP discriminator
# ---------------------------------------------------------------------------

def init_latent_discriminator(rng: jax.Array, *, code_dim: int = 512,
                              hidden: Sequence[int] = (512, 512, 512)
                              ) -> Dict[str, Any]:
    """MLP over latent codes (`discriminator.py:7-23`): the reference's
    n_mlp=4 default is three Linear(512,512)+LReLU then Linear(512,1) —
    the default `hidden` matches it so checkpoints map path-wise."""
    dims = [code_dim] + list(hidden) + [1]
    layers = []
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        k = jax.random.fold_in(rng, i)
        w = jax.random.normal(k, (a, b)) * math.sqrt(2.0 / a)
        layers.append({"w": w, "b": jnp.zeros((b,))})
    return {"layers": layers}


def latent_discriminator_apply(params, code, *, slope: float = 0.2):
    y = code
    for i, p in enumerate(params["layers"]):
        y = y @ p["w"] + p["b"]
        if i < len(params["layers"]) - 1:
            y = leaky_relu(y, slope)
    return y


# ---------------------------------------------------------------------------
# StarGANv2-style residual discriminator
# ---------------------------------------------------------------------------

def init_stargan_discriminator(rng: jax.Array, *, img_size: int = 256,
                               input_dim: int = 3, num_domains: int = 1,
                               max_width: int = 512) -> Dict[str, Any]:
    """Residual downsampling stack → domain logits
    (`discriminator.py:175-243`)."""
    import numpy as np
    repeat = int(np.log2(img_size)) - 2
    width = 2 ** 14 // img_size
    stem = _conv_init(jax.random.fold_in(rng, 0), input_dim, width, 3)
    blocks = []
    c_in = width
    for i in range(repeat):
        c_out = min(c_in * 2, max_width)
        k = jax.random.fold_in(rng, 10 + i)
        block = {
            "conv1": _conv_init(jax.random.fold_in(k, 0), c_in, c_in, 3),
            "conv2": _conv_init(jax.random.fold_in(k, 1), c_in, c_out, 3),
        }
        if c_in != c_out:
            # ResBlk's learned shortcut exists ONLY on width changes and
            # is bias-free (`discriminator.py:209,219`: learned_sc =
            # dim_in != dim_out, conv1x1 bias=False); equal-width blocks
            # use the identity
            block["skip"] = {
                "w": _conv_init(jax.random.fold_in(k, 2), c_in, c_out, 1)["w"]}
        blocks.append(block)
        c_in = c_out
    head1 = _conv_init(jax.random.fold_in(rng, 90), c_in, c_in, 4)
    head2 = _conv_init(jax.random.fold_in(rng, 91), c_in, num_domains, 1)
    return {"stem": stem, "blocks": blocks, "head1": head1, "head2": head2}


def stargan_discriminator_apply(params, x, *, slope: float = 0.2):
    from pggan_tpu.ops.basic import downscale2d
    y = _conv(params["stem"], x)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    for b in params["blocks"]:
        skip = y if "skip" not in b else _conv_nobias(b["skip"], y)
        skip = downscale2d(skip, 2)
        h = _conv(b["conv1"], leaky_relu(y, slope))
        h = downscale2d(h, 2)
        h = _conv(b["conv2"], leaky_relu(h, slope))
        y = (h + skip) * inv_sqrt2
    y = _conv(params["head1"], leaky_relu(y, slope), pad=0)  # 4×4, pad 0
    y = _conv(params["head2"], leaky_relu(y, slope))
    return y.reshape(y.shape[0], -1)
