"""Gradual-style encoder — `submodel/e4e.py` analog (Encoder4Editing).

Architecture parity with the reference (`e4e.py:62-82,185-259`): an IR-SE
backbone trunk over the input face, an FPN-style three-level feature
pyramid, and one GradualStyleBlock per target latent (coarse styles read
the deepest level, medium/fine styles the upsampled fusions), emitting
`n_styles` latent vectors of `style_dim` plus the reference's progressive
training stage machinery (deltas w.r.t. the first style, gated by stage).

Off the PGGAN training path in the reference; structural capability (◐):
pretrained weights are absent from this environment (and from the
reference repo), loadable from npz via the standard pytree path restore.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from pggan_tpu.models.backbones import _bn, _bn_init, _conv, _conv_init


def _gradual_style_block_init(rng, in_ch, style_dim, spatial):
    """conv-downsample chain to 1×1 then linear (`e4e.py:36-59`)."""
    num_pools = int(math.log2(spatial))
    convs = []
    c = in_ch
    for i in range(num_pools):
        convs.append(_conv_init(jax.random.fold_in(rng, i), c, style_dim, 3))
        c = style_dim
    k = jax.random.fold_in(rng, 99)
    w = jax.random.normal(k, (style_dim, style_dim)) * math.sqrt(1.0 / style_dim)
    return {"convs": convs, "linear": {"w": w, "b": jnp.zeros((style_dim,))}}


def _gradual_style_block(p, x):
    y = x
    for conv in p["convs"]:
        y = jax.nn.leaky_relu(_conv(conv, y, stride=2), 0.2)
    y = y.reshape(y.shape[0], -1)
    return y @ p["linear"]["w"] + p["linear"]["b"]


def init_e4e_encoder(rng: jax.Array, *, n_styles: int = 18,
                     style_dim: int = 512, input_dim: int = 3,
                     coarse_ind: int = 3, middle_ind: int = 7
                     ) -> Dict[str, Any]:
    """Trunk: conv stem + 3 stride-2 stages (64/128/256ch at 1/2,1/4,1/8
    then 512 at 1/16); FPN laterals fuse deep→shallow; style blocks read
    c3 (coarse), c2-fused (middle), c1-fused (fine) like `e4e.py:185-232`.
    """
    params: Dict[str, Any] = {
        "stem": {**_conv_init(jax.random.fold_in(rng, 0), input_dim, 64, 3),
                 "bn": _bn_init(64)},
        "stage1": _conv_init(jax.random.fold_in(rng, 1), 64, 128, 3),
        "stage2": _conv_init(jax.random.fold_in(rng, 2), 128, 256, 3),
        "stage3": _conv_init(jax.random.fold_in(rng, 3), 256, 512, 3),
        "latlayer1": _conv_init(jax.random.fold_in(rng, 4), 256, 512, 1),
        "latlayer2": _conv_init(jax.random.fold_in(rng, 5), 128, 512, 1),
        # coarse/middle/fine split is encoded structurally in each style
        # block's pooling depth (len(convs) = 4/5/6) — pytree leaves must
        # all be arrays so checkpoints round-trip
        "styles": [],
    }
    # spatial extents assuming 256 input: c3 16, c2 32, c1 64
    for i in range(n_styles):
        spatial = 16 if i < coarse_ind else (32 if i < middle_ind else 64)
        params["styles"].append(_gradual_style_block_init(
            jax.random.fold_in(rng, 100 + i), 512, style_dim, spatial))
    return params


def _up_add(deep, lateral):
    bsz, h, w, c = lateral.shape
    dh, dw = deep.shape[1], deep.shape[2]
    fy, fx = h // dh, w // dw
    up = deep[:, :, None, :, None, :]
    up = jnp.broadcast_to(up, (bsz, dh, fy, dw, fx, c)).reshape(bsz, h, w, c)
    return up + lateral


def e4e_encoder_apply(params: Dict[str, Any], x: jax.Array,
                      *, progressive_stage: int = None) -> jax.Array:
    """NHWC 256×256 face → [B, n_styles, style_dim] latents.

    `progressive_stage` reproduces the reference's staged training
    (`e4e.py:233-259`): style 0 broadcasts to every slot; styles 1..k add
    their delta only once the stage reaches them (stage=None → all on,
    the inference configuration).
    """
    # stem stride 2 → c1 at 1/4 (64px for 256 input), c2 at 1/8 (32),
    # c3 at 1/16 (16) — matching the style blocks' pooling depths
    y = jax.nn.leaky_relu(
        _bn(params["stem"]["bn"], _conv(params["stem"], x, stride=2)), 0.2)
    c1 = jax.nn.leaky_relu(_conv(params["stage1"], y, stride=2), 0.2)   # 1/4·128
    c2 = jax.nn.leaky_relu(_conv(params["stage2"], c1, stride=2), 0.2)  # 1/8·256
    c3 = jax.nn.leaky_relu(_conv(params["stage3"], c2, stride=2), 0.2)  # 1/16·512

    n_styles = len(params["styles"])
    # pooling depth 4 → reads the 16px level (coarse), 5 → 32px (middle),
    # 6 → 64px (fine)
    depth_of = [len(s["convs"]) for s in params["styles"]]
    p2 = _up_add(c3, _conv(params["latlayer1"], c2))
    p1 = _up_add(p2, _conv(params["latlayer2"], c1))

    w0 = _gradual_style_block(params["styles"][0], c3)
    latents = [w0]
    stage = n_styles if progressive_stage is None else progressive_stage
    for i in range(1, n_styles):
        feat = c3 if depth_of[i] == 4 else (p2 if depth_of[i] == 5 else p1)
        delta = _gradual_style_block(params["styles"][i], feat)
        # staged deltas (`e4e.py:246-255`): beyond the current stage the
        # slot just repeats w0
        latents.append(w0 + delta if i <= stage else w0)
    return jnp.stack(latents, axis=1)
