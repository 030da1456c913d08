"""BiSeNet face parser — `submodel/faceparser.py` analog.

Architecture parity with the reference (`faceparser.py:190-207`): a
ResNet-18 context path producing 1/8, 1/16, 1/32 features, Attention
Refinement Modules on the two deep stages plus a global-average context
tail, a Feature Fusion Module combining the (here: 1/8-resolution spatial)
path with the refined context, and conv heads emitting 19-class face-part
logits upsampled to input resolution. Off the PGGAN training path in the
reference (nothing imports it at runtime); provided for capability parity
with npz-loadable weights. Fixed-seed init by default (◐ in PARITY.md —
pretrained weights are not bundled anywhere, including the reference repo).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from pggan_tpu.models.backbones import (_bn, _bn_init, _conv, _conv_init,
                                        init_resnet18, resnet18_apply)


def _conv_bn_relu_init(rng, cin, cout, k):
    return {**_conv_init(rng, cin, cout, k), "bn": _bn_init(cout)}


def _conv_bn_relu(p, x, stride=1):
    return jax.nn.relu(_bn(p["bn"], _conv(p, x, stride)))


def _upsample_to(x, h, w):
    # nearest, matching F.interpolate(..., mode='nearest') in the reference
    bsz, xh, xw, c = x.shape
    assert h % xh == 0 and w % xw == 0
    fy, fx = h // xh, w // xw
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (bsz, xh, fy, xw, fx, c))
    return x.reshape(bsz, h, w, c)


def init_bisenet(rng: jax.Array, *, n_classes: int = 19,
                 input_dim: int = 3) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "resnet": init_resnet18(jax.random.fold_in(rng, 0),
                                input_dim=input_dim),
        # Attention refinement on 1/16 (256ch) and 1/32 (512ch) stages,
        # both projected to 128 channels (faceparser ContextPath).
        "arm16": {
            "conv": _conv_bn_relu_init(jax.random.fold_in(rng, 1), 256, 128, 3),
            "atten": {**_conv_init(jax.random.fold_in(rng, 2), 128, 128, 1),
                      "bn": _bn_init(128)},
        },
        "arm32": {
            "conv": _conv_bn_relu_init(jax.random.fold_in(rng, 3), 512, 128, 3),
            "atten": {**_conv_init(jax.random.fold_in(rng, 4), 128, 128, 1),
                      "bn": _bn_init(128)},
        },
        "conv_avg": _conv_bn_relu_init(jax.random.fold_in(rng, 5), 512, 128, 1),
        "conv_head16": _conv_bn_relu_init(jax.random.fold_in(rng, 6), 128, 128, 3),
        "conv_head32": _conv_bn_relu_init(jax.random.fold_in(rng, 7), 128, 128, 3),
        # Feature fusion: spatial path (1/8 stage, 128ch) + context (128ch)
        "ffm": {
            "conv": _conv_bn_relu_init(jax.random.fold_in(rng, 8), 256, 256, 1),
            "fc1": _conv_init(jax.random.fold_in(rng, 9), 256, 64, 1),
            "fc2": _conv_init(jax.random.fold_in(rng, 10), 64, 256, 1),
        },
        "head": {
            "conv": _conv_bn_relu_init(jax.random.fold_in(rng, 11), 256, 256, 3),
            "out": _conv_init(jax.random.fold_in(rng, 12), 256, n_classes, 1),
        },
    }
    return params


def _arm(p, x):
    """Attention refinement (`faceparser.py` ARM): conv-bn-relu then a
    global-pool sigmoid channel gate."""
    feat = _conv_bn_relu(p["conv"], x)
    atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
    atten = jax.nn.sigmoid(_bn(p["atten"]["bn"], _conv(p["atten"], atten)))
    return feat * atten


def bisenet_apply(params: Dict[str, Any], x: jax.Array) -> jax.Array:
    """NHWC image → [B, H, W, n_classes] face-part logits
    (reference returns the 1/1-resolution head output, `faceparser.py:205`).
    H and W must be multiples of 32.
    """
    bsz, h, w, _ = x.shape
    feat8, feat16, feat32 = resnet18_apply(params["resnet"], x,
                                           return_stages=True)

    # context tail: global average of the 1/32 stage
    avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
    avg = _conv_bn_relu(params["conv_avg"], avg)
    avg_up = jnp.broadcast_to(avg, (bsz, feat32.shape[1], feat32.shape[2],
                                    avg.shape[-1]))

    f32 = _arm(params["arm32"], feat32) + avg_up
    f32_up = _upsample_to(f32, feat16.shape[1], feat16.shape[2])
    f32_up = _conv_bn_relu(params["conv_head32"], f32_up)

    f16 = _arm(params["arm16"], feat16) + f32_up
    f16_up = _upsample_to(f16, feat8.shape[1], feat8.shape[2])
    f16_up = _conv_bn_relu(params["conv_head16"], f16_up)

    # feature fusion with the 1/8 spatial features
    fuse_in = jnp.concatenate([feat8, f16_up], axis=-1)
    feat = _conv_bn_relu(params["ffm"]["conv"], fuse_in)
    atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
    atten = jax.nn.relu(_conv(params["ffm"]["fc1"], atten))
    atten = jax.nn.sigmoid(_conv(params["ffm"]["fc2"], atten))
    feat = feat * atten + feat

    out = _conv_bn_relu(params["head"]["conv"], feat)
    out = _conv(params["head"]["out"], out)
    # FINAL logits upsample is bilinear align_corners=True
    # (`faceparser.py:206`) — only the ContextPath's internal merges are
    # nearest (`:158-167`); nearest here would give blocky 1/8-grid
    # boundaries and break torch parity for ported weights.
    from pggan_tpu.ops.resample import bilinear_align_corners
    return bilinear_align_corners(out, h, w)


def convert_bisenet_state_dict(sd):
    """torch `BiSeNet(n_classes).state_dict()` (`faceparser.py:190-207`) →
    flat path dict for `arrays_to_tree(init_bisenet(...), out, strict=True)`.

    Module-tree mapping (reference → this pytree):
      * `cp.resnet.*` → `resnet/...` (torchvision ResNet-18 key scheme,
        `submodel/resnet.py:10-40`)
      * `cp.arm{16,32}.{conv,conv_atten,bn_atten}` → `arm{16,32}/{conv,atten}`
      * `cp.{conv_avg,conv_head16,conv_head32}` → same names (ConvBNReLU:
        `.conv.weight` + `.bn.*`, all convs bias-free, `faceparser.py:90-105`)
      * `ffm.{convblk,conv1,conv2}` → `ffm/{conv,fc1,fc2}` (the 1×1
        attention convs act on the pooled map; kept as 1×1 convs here so
        the HWIO transpose is uniform)
      * `conv_out.{conv,conv_out}` → `head/{conv,out}`
      * `conv_out16.*` / `conv_out32.*` are DROPPED: they are the deep-
        supervision heads of BiSeNet *training*; the reference's forward
        never calls them (`faceparser.py:203-207` returns only the fused
        head) and this inference tree does not carry them.
    BatchNorm buffers map {weight,bias,running_mean,running_var} →
    {scale,bias,mean,var}; `num_batches_tracked` is dropped.
    """
    from pggan_tpu.models.backbones import (_np, _np_conv_w, _put_torch_bn,
                                            convert_resnet18_state_dict)

    out = {}
    for path, arr in convert_resnet18_state_dict(
            sd, torch_prefix="cp.resnet.").items():
        out[f"resnet/{path}"] = arr

    def put_conv_bn_relu(path, tprefix):
        out[f"{path}/w"] = _np_conv_w(sd, f"{tprefix}.conv.weight")
        _put_torch_bn(out, f"{path}/bn", sd, f"{tprefix}.bn")

    for arm in ("arm16", "arm32"):
        put_conv_bn_relu(f"{arm}/conv", f"cp.{arm}.conv")
        out[f"{arm}/atten/w"] = _np_conv_w(sd, f"cp.{arm}.conv_atten.weight")
        _put_torch_bn(out, f"{arm}/atten/bn", sd, f"cp.{arm}.bn_atten")
    for name in ("conv_avg", "conv_head16", "conv_head32"):
        put_conv_bn_relu(name, f"cp.{name}")

    put_conv_bn_relu("ffm/conv", "ffm.convblk")
    out["ffm/fc1/w"] = _np_conv_w(sd, "ffm.conv1.weight")
    out["ffm/fc2/w"] = _np_conv_w(sd, "ffm.conv2.weight")

    put_conv_bn_relu("head/conv", "conv_out.conv")
    out["head/out/w"] = _np_conv_w(sd, "conv_out.conv_out.weight")
    return out
