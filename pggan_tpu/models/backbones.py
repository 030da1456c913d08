"""Feature-extraction backbones — `submodel/resnet.py` and
`submodel/arcface.py` analogs.

These sit OFF the PGGAN training path in the reference (nothing imports
them at runtime, SURVEY.md §2d) but are part of its capability surface:
ResNet-18 (the BiSeNet context path's backbone, `submodel/resnet.py:10-89`)
and the IR-SE ArcFace face-ID embedder (`submodel/arcface.py:89-118`).
Functional JAX, NHWC, plain-dict params; weights loadable from a local npz
via `pggan_tpu.utils.checkpoint.arrays_to_tree` (no pretrained downloads in
this environment — fixed-seed init by default, so they double as
deterministic metric backbones).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp



def _conv_init(rng, cin, cout, k, *, bias=False):
    fan_in = cin * k * k
    w = jax.random.normal(rng, (k, k, cin, cout)) * math.sqrt(2.0 / fan_in)
    if not bias:
        return {"w": w}
    # torch nn.Conv2d default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    bound = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(jax.random.fold_in(rng, 0xB1A5), (cout,),
                           minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _conv(p, x, stride=1):
    # Explicit symmetric k//2 padding (torch Conv2d semantics): XLA's
    # "SAME" pads asymmetrically for strided convs (end-heavy), which
    # shifts every stride-2 window by one pixel vs the torch reference —
    # weight-ported backbones would silently diverge.
    kh, kw = p["w"].shape[0], p["w"].shape[1]
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride),
        ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"] if "b" in p else y


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps) * p["scale"]
    return x * inv + (p["bias"] - p["mean"] * inv)


# ---------------------------------------------------------------------------
# ResNet-18
# ---------------------------------------------------------------------------

def _resnet_stride(stage_idx: int, block_idx: int) -> int:
    return 2 if (stage_idx > 0 and block_idx == 0) else 1


def init_resnet18(rng: jax.Array, *, input_dim: int = 3) -> Dict[str, Any]:
    """Standard ResNet-18: 7×7/2 stem + maxpool + 4 stages of 2 basic
    blocks (64/128/256/512), strides (1,2,2,2) (`submodel/resnet.py:10-60`).
    """
    params: Dict[str, Any] = {
        "stem": {**_conv_init(jax.random.fold_in(rng, 0), input_dim, 64, 7),
                 "bn": _bn_init(64)},
        "stages": [],
    }
    widths = [64, 128, 256, 512]
    c_in = 64
    for s, width in enumerate(widths):
        stage = []
        for b in range(2):
            k = jax.random.fold_in(rng, 100 * (s + 1) + b)
            # stride is structural (derived from position at apply time),
            # NOT a pytree leaf — leaves must all be arrays so checkpoints
            # round-trip through the npz machinery
            stride = _resnet_stride(s, b)
            block = {
                "conv1": _conv_init(jax.random.fold_in(k, 0), c_in, width, 3),
                "bn1": _bn_init(width),
                "conv2": _conv_init(jax.random.fold_in(k, 1), width, width, 3),
                "bn2": _bn_init(width),
            }
            if stride != 1 or c_in != width:
                block["down"] = _conv_init(jax.random.fold_in(k, 2), c_in, width, 1)
                block["down_bn"] = _bn_init(width)
            stage.append(block)
            c_in = width
        params["stages"].append(stage)
    return params


def resnet18_apply(params: Dict[str, Any], x: jax.Array,
                   *, return_stages: bool = False):
    """Returns the final feature map [B, H/32, W/32, 512], or the
    (stage2, stage3, stage4) pyramid the BiSeNet context path consumes
    (`submodel/resnet.py:70-82` returns feat8/16/32)."""
    y = _conv(params["stem"], x, stride=2)
    y = jax.nn.relu(_bn(params["stem"]["bn"], y))
    # 3×3/2 maxpool
    # torch MaxPool2d(3, 2, padding=1): symmetric -inf padding; XLA "SAME"
    # would pad end-heavy (0,1) and shift every window one pixel vs torch.
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1),
                              ((0, 0), (1, 1), (1, 1), (0, 0)))
    feats: List[jax.Array] = []
    for s, stage in enumerate(params["stages"]):
        for b, block in enumerate(stage):
            stride = _resnet_stride(s, b)
            h = jax.nn.relu(_bn(block["bn1"], _conv(block["conv1"], y, stride)))
            h = _bn(block["bn2"], _conv(block["conv2"], h))
            skip = y
            if "down" in block:
                skip = _bn(block["down_bn"], _conv(block["down"], y, stride))
            y = jax.nn.relu(h + skip)
        feats.append(y)
    if return_stages:
        return feats[1], feats[2], feats[3]     # 1/8, 1/16, 1/32
    return y


# ---------------------------------------------------------------------------
# ResNet-50 (bottleneck) — the Deep3DMM ReconNet backbone
# (`submodel/deep3dmm.py:380-513`: vendored torchvision ResNet with
# Bottleneck blocks, layers [3,4,6,3])
# ---------------------------------------------------------------------------

_RESNET50_LAYERS = (3, 4, 6, 3)


def init_resnet50(rng: jax.Array, *, input_dim: int = 3) -> Dict[str, Any]:
    """7×7/2 stem + maxpool + 4 bottleneck stages (widths 64/128/256/512,
    4× expansion → 2048 final channels), stride on the 3×3 conv (torch
    Bottleneck placement)."""
    params: Dict[str, Any] = {
        "stem": {**_conv_init(jax.random.fold_in(rng, 0), input_dim, 64, 7),
                 "bn": _bn_init(64)},
        "stages": [],
    }
    widths = [64, 128, 256, 512]
    c_in = 64
    for s, (width, count) in enumerate(zip(widths, _RESNET50_LAYERS)):
        stage = []
        out_ch = width * 4
        for b in range(count):
            k = jax.random.fold_in(rng, 100 * (s + 1) + b)
            stride = _resnet_stride(s, b)
            block = {
                "conv1": _conv_init(jax.random.fold_in(k, 0), c_in, width, 1),
                "bn1": _bn_init(width),
                "conv2": _conv_init(jax.random.fold_in(k, 1), width, width, 3),
                "bn2": _bn_init(width),
                "conv3": _conv_init(jax.random.fold_in(k, 2), width, out_ch, 1),
                "bn3": _bn_init(out_ch),
            }
            if stride != 1 or c_in != out_ch:
                block["down"] = _conv_init(jax.random.fold_in(k, 3), c_in, out_ch, 1)
                block["down_bn"] = _bn_init(out_ch)
            stage.append(block)
            c_in = out_ch
        params["stages"].append(stage)
    return params


def resnet50_apply(params: Dict[str, Any], x: jax.Array) -> jax.Array:
    """Returns the final feature map [B, H/32, W/32, 2048]."""
    y = _conv(params["stem"], x, stride=2)
    y = jax.nn.relu(_bn(params["stem"]["bn"], y))
    # torch MaxPool2d(3, 2, padding=1): symmetric -inf padding; XLA "SAME"
    # would pad end-heavy (0,1) and shift every window one pixel vs torch.
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1),
                              ((0, 0), (1, 1), (1, 1), (0, 0)))
    for s, stage in enumerate(params["stages"]):
        for b, block in enumerate(stage):
            stride = _resnet_stride(s, b)
            h = jax.nn.relu(_bn(block["bn1"], _conv(block["conv1"], y)))
            h = jax.nn.relu(_bn(block["bn2"], _conv(block["conv2"], h, stride)))
            h = _bn(block["bn3"], _conv(block["conv3"], h))
            skip = y
            if "down" in block:
                skip = _bn(block["down_bn"], _conv(block["down"], y, stride))
            y = jax.nn.relu(h + skip)
    return y


# ---------------------------------------------------------------------------
# IR-SE (ArcFace) embedder
# ---------------------------------------------------------------------------

def _linear_init(rng, din, dout):
    w = jax.random.normal(rng, (din, dout)) * math.sqrt(1.0 / din)
    return {"w": w, "b": jnp.zeros((dout,))}


def _irse_stride(block_idx: int) -> int:
    return 2 if block_idx == 0 else 1


_IRSE_STAGES = {
    50: [(64, 3), (128, 4), (256, 14), (512, 3)],
    100: [(64, 3), (128, 13), (256, 30), (512, 3)],
    152: [(64, 3), (128, 8), (256, 36), (512, 3)],
}


def init_irse(rng: jax.Array, *, num_layers: int = 50, input_dim: int = 3,
              embedding_dim: int = 512, input_size: int = 112
              ) -> Dict[str, Any]:
    """IR-SE ResNet (ArcFace backbone, `submodel/arcface.py:89-118`):
    3×3 stem, bottleneck-IR-SE blocks with squeeze-excitation, final
    flatten → linear embedding (l2-normalized at apply time)."""
    assert num_layers in _IRSE_STAGES
    params: Dict[str, Any] = {
        "stem": init_irse_stem(jax.random.fold_in(rng, 0), input_dim),
        "stages": init_irse_stages(rng, num_layers=num_layers),
    }
    feat_side = input_size // 16
    # output_layer (`arcface.py:99-103`): BN2d(512) → Dropout → Flatten →
    # Linear(512·side², 512) → BN1d(512); dropout is an inference no-op.
    params["head_bn2d"] = _bn_init(512)
    params["head"] = _linear_init(jax.random.fold_in(rng, 7),
                                  512 * feat_side * feat_side, embedding_dim)
    params["head_bn1d"] = _bn_init(embedding_dim)
    return params


def init_irse_stem(rng: jax.Array, input_dim: int = 3) -> Dict[str, Any]:
    """conv3×3/1 + BN + per-channel PReLU (`arcface.py:92-94`,
    identically `e4e.py:192-194` input_layer)."""
    return {**_conv_init(rng, input_dim, 64, 3), "bn": _bn_init(64),
            "prelu": jnp.full((64,), 0.25)}


def init_irse_stages(rng: jax.Array, *, num_layers: int = 50
                     ) -> List[List[Dict[str, Any]]]:
    """The bottleneck-IR-SE body shared by ArcFace (`arcface.py:30-53`)
    and e4e (`e4e.py:159-183`) — weight-mappable structure:
      * per-channel PReLU parameters (torch nn.PReLU(depth))
      * SE convs are bias-free (SEModule fc1/fc2, `e4e.py:144-147`)
      * shortcut: MaxPool2d(1, stride) — a pure subsample — when
        in_channel == depth; conv1×1+BN only on channel changes
        (`e4e.py:162-168`)
    """
    stages: List[List[Dict[str, Any]]] = []
    c_in = 64
    for s, (width, count) in enumerate(_IRSE_STAGES[num_layers]):
        stage = []
        for b in range(count):
            k = jax.random.fold_in(rng, 1000 * (s + 1) + b)
            se_dim = max(width // 16, 1)
            block = {
                "bn0": _bn_init(c_in),
                "conv1": _conv_init(jax.random.fold_in(k, 0), c_in, width, 3),
                "prelu": jnp.full((width,), 0.25),
                "conv2": _conv_init(jax.random.fold_in(k, 1), width, width, 3),
                "bn2": _bn_init(width),
                "se_fc1": {"w": _linear_init(jax.random.fold_in(k, 2), width, se_dim)["w"]},
                "se_fc2": {"w": _linear_init(jax.random.fold_in(k, 3), se_dim, width)["w"]},
            }
            if c_in != width:
                block["down"] = _conv_init(jax.random.fold_in(k, 4), c_in, width, 1)
                block["down_bn"] = _bn_init(width)
            stage.append(block)
            c_in = width
        stages.append(stage)
    return stages


def _prelu(x, slope):
    slope = jnp.reshape(slope, (1,) * (x.ndim - 1) + (-1,))
    return jnp.where(x >= 0, x, x * slope)


def irse_block_apply(block: Dict[str, Any], y: jax.Array, stride: int
                     ) -> jax.Array:
    """One bottleneck-IR-SE unit (`e4e.py:159-183` / `arcface.py:30-53`):
    res = SE(BN(conv3x3/stride(PReLU(BN(conv3x3(BN0(x))))))), shortcut =
    subsample or conv1×1/stride + BN, output res + shortcut.

    NOTE the reference applies conv1 at stride 1 and conv2 at `stride`
    (`e4e.py:169-176`), and its res_layer has NO trailing activation.
    """
    h = _bn(block["bn0"], y)
    h = _prelu(_conv(block["conv1"], h), block["prelu"])
    h = _bn(block["bn2"], _conv(block["conv2"], h, stride))
    # squeeze-excitation (bias-free 1×1 convs ≡ linears on pooled vector)
    se = jnp.mean(h, axis=(1, 2))
    se = jax.nn.relu(se @ block["se_fc1"]["w"])
    se = jax.nn.sigmoid(se @ block["se_fc2"]["w"])
    h = h * se[:, None, None, :]
    if "down" in block:
        skip = _bn(block["down_bn"], _conv(block["down"], y, stride))
    elif stride != 1:
        skip = y[:, ::stride, ::stride, :]      # MaxPool2d(1, stride)
    else:
        skip = y
    return h + skip


def irse_trunk_apply(stem: Dict[str, Any], stages, x: jax.Array,
                     *, taps: bool = False):
    """Stem + body. taps=True also returns the per-stage outputs
    [c0, c1, c2, c3] (stage ends — for IR-SE-50 these are flattened body
    indices 2/6/20/23, exactly the reference e4e taps `e4e.py:236-243`)."""
    y = _prelu(_bn(stem["bn"], _conv(stem, x)), stem["prelu"])
    outs = []
    for stage in stages:
        for b, block in enumerate(stage):
            y = irse_block_apply(block, y, _irse_stride(b))
        outs.append(y)
    return (y, outs) if taps else y


def irse_apply(params: Dict[str, Any], x: jax.Array) -> jax.Array:
    """NHWC face crop → l2-normalized embedding [B, 512]
    (`arcface.py:100-118`: output_layer then l2_norm)."""
    y = irse_trunk_apply(params["stem"], params["stages"], x)
    y = _bn(params["head_bn2d"], y)
    y = y.transpose(0, 3, 1, 2).reshape(y.shape[0], -1)   # torch flatten order
    emb = y @ params["head"]["w"] + params["head"]["b"]
    emb = _bn(params["head_bn1d"], emb)
    return emb * jax.lax.rsqrt(jnp.sum(emb * emb, axis=-1, keepdims=True) + 1e-10)


# ---------------------------------------------------------------------------
# torch state_dict converters (weight portability — PARITY.md §2d)
#
# Every converter emits a flat {pytree-path: np.ndarray} dict that loads via
# `utils.checkpoint.arrays_to_tree(init_*(...), out, strict=True)`. Layout
# transforms: conv weights OIHW→HWIO, 1×1-conv-as-linear [out,in,1,1]→[in,out],
# nn.Linear [out,in]→[in,out]; BatchNorm {weight,bias,running_mean,running_var}
# → {scale,bias,mean,var}; `num_batches_tracked` buffers dropped.
# ---------------------------------------------------------------------------

def _np(v):
    import numpy as np
    return np.asarray(v)


def _np_conv_w(sd, key):
    """torch Conv2d weight OIHW → HWIO."""
    import numpy as np
    return np.transpose(_np(sd[key]), (2, 3, 1, 0))


def _put_torch_bn(out, path: str, sd, prefix: str):
    out[f"{path}/scale"] = _np(sd[prefix + ".weight"])
    out[f"{path}/bias"] = _np(sd[prefix + ".bias"])
    out[f"{path}/mean"] = _np(sd[prefix + ".running_mean"])
    out[f"{path}/var"] = _np(sd[prefix + ".running_var"])


def convert_irse_trunk_state_dict(sd, out, *, num_layers: int = 50,
                                  torch_prefix: str = "") -> None:
    """Map the torch IR-SE stem+body (`arcface.py:96-115` input_layer/body —
    the identical module tree appears in `e4e.py:192-202`) into `out` under
    `stem/...` and `stages/{s}/{b}/...` (the `init_irse_stem` /
    `init_irse_stages` pytree)."""
    t = torch_prefix
    out["stem/w"] = _np_conv_w(sd, f"{t}input_layer.0.weight")
    _put_torch_bn(out, "stem/bn", sd, f"{t}input_layer.1")
    out["stem/prelu"] = _np(sd[f"{t}input_layer.2.weight"])

    flat, c_in = 0, 64
    for s, (width, count) in enumerate(_IRSE_STAGES[num_layers]):
        for b in range(count):
            p = f"stages/{s}/{b}"
            tb = f"{t}body.{flat}"
            _put_torch_bn(out, f"{p}/bn0", sd, f"{tb}.res_layer.0")
            out[f"{p}/conv1/w"] = _np_conv_w(sd, f"{tb}.res_layer.1.weight")
            out[f"{p}/prelu"] = _np(sd[f"{tb}.res_layer.2.weight"])
            out[f"{p}/conv2/w"] = _np_conv_w(sd, f"{tb}.res_layer.3.weight")
            _put_torch_bn(out, f"{p}/bn2", sd, f"{tb}.res_layer.4")
            # SE 1×1 convs act on the pooled vector: out[o]=Σᵢ W[o,i]·x[i]
            # ≡ x @ W.T under the `se @ w` convention in irse_block_apply
            out[f"{p}/se_fc1/w"] = \
                _np(sd[f"{tb}.res_layer.5.fc1.weight"])[:, :, 0, 0].T
            out[f"{p}/se_fc2/w"] = \
                _np(sd[f"{tb}.res_layer.5.fc2.weight"])[:, :, 0, 0].T
            if c_in != width:
                out[f"{p}/down/w"] = _np_conv_w(
                    sd, f"{tb}.shortcut_layer.0.weight")
                _put_torch_bn(out, f"{p}/down_bn", sd,
                              f"{tb}.shortcut_layer.1")
            flat, c_in = flat + 1, width


def convert_arcface_state_dict(sd, *, num_layers: int = 50):
    """torch `Backbone(num_layers, drop, 'ir_se').state_dict()`
    (`arcface.py:89-118`) → flat path dict for
    `arrays_to_tree(init_irse(...), out, strict=True)`.

    output_layer indices (`arcface.py:99-103`: Sequential(BN2d, Dropout,
    Flatten, Linear, BN1d)): `.0` → head_bn2d, `.3` → head (torch Linear
    [out,in] → [in,out]; the flatten order is NCHW, matched by
    `irse_apply`'s transpose-then-reshape), `.4` → head_bn1d."""
    out: Dict[str, Any] = {}
    convert_irse_trunk_state_dict(sd, out, num_layers=num_layers)
    _put_torch_bn(out, "head_bn2d", sd, "output_layer.0")
    out["head/w"] = _np(sd["output_layer.3.weight"]).T
    out["head/b"] = _np(sd["output_layer.3.bias"])
    _put_torch_bn(out, "head_bn1d", sd, "output_layer.4")
    return out


def _convert_resnet_trunk(sd, out, *, layers: Sequence[int],
                          bottleneck: bool, torch_prefix: str = "") -> None:
    """torchvision-style ResNet keys (`conv1/bn1/layer{1..4}.{b}.*` — the
    scheme shared by BiSeNet's Resnet18 `submodel/resnet.py:10-89` and
    Deep3DMM's vendored ResNet `submodel/deep3dmm.py:398-505`) → the
    `init_resnet18`/`init_resnet50` pytree paths."""
    t = torch_prefix
    out["stem/w"] = _np_conv_w(sd, f"{t}conv1.weight")
    _put_torch_bn(out, "stem/bn", sd, f"{t}bn1")
    n_convs = 3 if bottleneck else 2
    for s, count in enumerate(layers):
        for b in range(count):
            p = f"stages/{s}/{b}"
            tb = f"{t}layer{s + 1}.{b}"
            for i in range(1, n_convs + 1):
                out[f"{p}/conv{i}/w"] = _np_conv_w(sd, f"{tb}.conv{i}.weight")
                _put_torch_bn(out, f"{p}/bn{i}", sd, f"{tb}.bn{i}")
            if f"{tb}.downsample.0.weight" in sd:
                out[f"{p}/down/w"] = _np_conv_w(sd, f"{tb}.downsample.0.weight")
                _put_torch_bn(out, f"{p}/down_bn", sd, f"{tb}.downsample.1")


def convert_resnet18_state_dict(sd, *, torch_prefix: str = ""):
    """torch ResNet-18 state_dict (torchvision key scheme — what BiSeNet's
    `Resnet18.init_weight` loads, `submodel/resnet.py:34-40`) → flat path
    dict for `arrays_to_tree(init_resnet18(...), out, strict=True)`.
    A classifier `fc.{weight,bias}` (absent from our feature-pyramid tree)
    is ignored, mirroring the reference's own `if 'fc' in k: continue`."""
    out: Dict[str, Any] = {}
    _convert_resnet_trunk(sd, out, layers=(2, 2, 2, 2), bottleneck=False,
                          torch_prefix=torch_prefix)
    return out


def convert_resnet50_state_dict(sd, *, torch_prefix: str = ""):
    """torch ResNet-50 (Bottleneck [3,4,6,3]) state_dict → flat path dict
    for `arrays_to_tree(init_resnet50(...), out, strict=True)`."""
    out: Dict[str, Any] = {}
    _convert_resnet_trunk(sd, out, layers=_RESNET50_LAYERS, bottleneck=True,
                          torch_prefix=torch_prefix)
    return out
