"""Gradual-style encoder — `submodel/e4e.py` analog (Encoder4Editing).

Architecture parity with the reference (`e4e.py:185-259`): the FULL
bottleneck-IR-SE-50 body as the trunk (shared with the ArcFace backbone —
`models/backbones.py init_irse_stages`), feature taps at the reference's
flattened body indices 6 / 20 / 23 (`e4e.py:236-243`) — which are exactly
the last units of the 128/256/512 stages — an FPN that fuses deep→shallow
via 1×1 laterals + nearest-upsample-add (`e4e.py:218-219, 251-254`), and
one GradualStyleBlock per target latent: coarse styles (i < 3) read c3,
middle (3 ≤ i < 7) the c2 fusion, fine the c1 fusion, each emitting a
delta on the first style w0 gated by the progressive training stage
(`e4e.py:244-259`).

Weight-mappable ◐ structure: the trunk pytree is the IR-SE pytree (real
e4e checkpoints map path-wise onto stem/stages), GradualStyleBlock's
linear is the reference EqualLinear (runtime 1/√in scale, `e4e.py:85-114`).
Pretrained weights are absent from this environment; load from npz via
the standard pytree path restore.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from pggan_tpu.ops.resample import bilinear_align_corners as _bilinear_align_corners
from pggan_tpu.models.backbones import (_conv, _conv_init,
                                        init_irse_stem, init_irse_stages,
                                        irse_trunk_apply, _bn)


def _gradual_style_block_init(rng, in_ch, style_dim, spatial):
    """conv3×3/2 + LeakyReLU chain down to 1×1, then EqualLinear
    (`e4e.py:117-139`): first conv maps in_ch→style_dim, the remaining
    num_pools−1 keep style_dim."""
    num_pools = int(math.log2(spatial))
    convs = []
    c = in_ch
    for i in range(num_pools):
        # torch-default bias=True convs (`e4e.py:124-131`) — real e4e
        # checkpoints carry `.bias` tensors for every style-block conv
        convs.append(_conv_init(jax.random.fold_in(rng, i), c, style_dim, 3,
                                bias=True))
        c = style_dim
    k = jax.random.fold_in(rng, 99)
    # EqualLinear (`e4e.py:85-114`): weight ~ N(0,1)/lr_mul, runtime scale
    # (1/√in)·lr_mul, bias·lr_mul; lr_mul = 1 here.
    w = jax.random.normal(k, (style_dim, style_dim))
    return {"convs": convs,
            "linear": {"w": w, "b": jnp.zeros((style_dim,)),
                       "scale": jnp.asarray(1.0 / math.sqrt(style_dim))}}


def _gradual_style_block(p, x):
    y = x
    for conv in p["convs"]:
        y = jax.nn.leaky_relu(_conv(conv, y, stride=2), 0.01)  # torch default
    y = y.reshape(y.shape[0], -1)
    lin = p["linear"]
    scale = jax.lax.stop_gradient(lin["scale"])     # runtime constant
    return y @ (lin["w"] * scale) + lin["b"]


def init_e4e_encoder(rng: jax.Array, *, n_styles: int = 18,
                     style_dim: int = 512, input_dim: int = 3,
                     num_layers: int = 50,
                     coarse_ind: int = 3, middle_ind: int = 7
                     ) -> Dict[str, Any]:
    """Full e4e pytree: IR-SE-50 stem+body, FPN laterals, style heads.

    n_styles = 2·log2(output_size) − 2 (18 for a 1024² StyleGAN,
    `e4e.py:206-208`).
    """
    params: Dict[str, Any] = {
        "stem": init_irse_stem(jax.random.fold_in(rng, 0), input_dim),
        "stages": init_irse_stages(jax.random.fold_in(rng, 1),
                                   num_layers=num_layers),
        # FPN laterals are torch-default bias=True (`e4e.py:218-219`)
        "latlayer1": _conv_init(jax.random.fold_in(rng, 4), 256, 512, 1,
                                bias=True),
        "latlayer2": _conv_init(jax.random.fold_in(rng, 5), 128, 512, 1,
                                bias=True),
        # coarse/middle/fine split is encoded structurally in each style
        # block's pooling depth (len(convs) = 4/5/6) — pytree leaves must
        # all be arrays so checkpoints round-trip
        "styles": [],
    }
    # spatial extents are the reference constants 16/32/64 (`e4e.py:210-216`)
    for i in range(n_styles):
        spatial = 16 if i < coarse_ind else (32 if i < middle_ind else 64)
        params["styles"].append(_gradual_style_block_init(
            jax.random.fold_in(rng, 100 + i), 512, style_dim, spatial))
    return params


def _up_add(deep, lateral):
    """FPN merge `_upsample_add` (`e4e.py:261-278`): bilinear-upsample
    deep to the lateral's size with align_corners=True, then add."""
    _, h, w, _ = lateral.shape
    return _bilinear_align_corners(deep, h, w) + lateral


def e4e_encoder_apply(params: Dict[str, Any], x: jax.Array,
                      *, progressive_stage: Optional[int] = None
                      ) -> jax.Array:
    """NHWC 256×256 face → [B, n_styles, style_dim] latents.

    `progressive_stage` reproduces the reference's staged training
    (`e4e.py:244-259`): style 0 broadcasts to every slot; styles 1..k add
    their delta only once the stage reaches them (stage=None → all on,
    the inference configuration).
    """
    # stem (stride 1) then the shared IR-SE body; taps = stage-end
    # features: c1 after flattened unit 6 (128ch, 1/4), c2 after 20
    # (256ch, 1/8), c3 after 23 (512ch, 1/16) — `e4e.py:236-243`
    _, taps = irse_trunk_apply(params["stem"], params["stages"], x,
                               taps=True)
    c1, c2, c3 = taps[1], taps[2], taps[3]

    n_styles = len(params["styles"])
    depth_of = [len(s["convs"]) for s in params["styles"]]
    p2 = _up_add(c3, _conv(params["latlayer1"], c2))
    p1 = _up_add(p2, _conv(params["latlayer2"], c1))

    w0 = _gradual_style_block(params["styles"][0], c3)
    latents = [w0]
    stage = n_styles if progressive_stage is None else progressive_stage
    for i in range(1, n_styles):
        feat = c3 if depth_of[i] == 4 else (p2 if depth_of[i] == 5 else p1)
        delta = _gradual_style_block(params["styles"][i], feat)
        # staged deltas (`e4e.py:255-259`): beyond the current stage the
        # slot just repeats w0
        latents.append(w0 + delta if i <= stage else w0)
    return jnp.stack(latents, axis=1)


def convert_e4e_state_dict(sd, *, num_layers: int = 50, n_styles: int = 18,
                           style_dim: int = 512):
    """torch `Encoder4Editing.state_dict()` → flat path dict loadable via
    `arrays_to_tree(init_e4e_encoder(...), out, strict=True)`.

    Covers the full reference module tree (`e4e.py:185-259`):
    `input_layer.{0,1,2}` (conv/BN/PReLU), `body.{i}.res_layer.{0..5}` +
    `body.{i}.shortcut_layer.{0,1}` (bottleneck_IR_SE, `e4e.py:159-183`),
    `styles.{i}.convs.{2j}` + `styles.{i}.linear` (GradualStyleBlock with
    torch-default conv biases, `e4e.py:117-139`), `latlayer1/2`
    (`e4e.py:218-219`). Conv weights transpose OIHW→HWIO; SE 1×1 convs and
    EqualLinear become [in,out] matrices; the linear's runtime `scale`
    leaf (no torch counterpart — it is StyleGAN's 1/√in constant) is
    synthesized. `num_batches_tracked` buffers are dropped.
    """
    import numpy as np
    from pggan_tpu.models.backbones import convert_irse_trunk_state_dict

    def conv_w(key):
        return np.transpose(np.asarray(sd[key]), (2, 3, 1, 0))   # OIHW→HWIO

    out = {}

    def put(path, value):
        out[path] = np.asarray(value)

    # input_layer/body are the shared IR-SE trunk (`e4e.py:192-202` builds
    # the identical module tree as ArcFace's Backbone) — one converter
    convert_irse_trunk_state_dict(sd, out, num_layers=num_layers)

    for name in ("latlayer1", "latlayer2"):
        put(f"{name}/w", conv_w(f"{name}.weight"))
        put(f"{name}/b", sd[f"{name}.bias"])

    for i in range(n_styles):
        j = 0
        while f"styles.{i}.convs.{2 * j}.weight" in sd:
            put(f"styles/{i}/convs/{j}/w",
                conv_w(f"styles.{i}.convs.{2 * j}.weight"))
            put(f"styles/{i}/convs/{j}/b", sd[f"styles.{i}.convs.{2 * j}.bias"])
            j += 1
        put(f"styles/{i}/linear/w", np.asarray(sd[f"styles.{i}.linear.weight"]).T)
        put(f"styles/{i}/linear/b", sd[f"styles.{i}.linear.bias"])
        put(f"styles/{i}/linear/scale", np.float64(1.0 / math.sqrt(style_dim)))
    return out
