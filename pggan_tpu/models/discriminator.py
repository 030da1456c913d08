"""Progressive discriminator as a pure function of a parameter pytree.

Architecture parity with the reference `pggan/nets.py:164-277`:

  input [B, R, R, 3] (R = 4 · 2^scale)
    → fromRGB 1x1 conv + LReLU at the active scale (`lib/blocks.py:271-292`)
    → per grown block, walked outermost-first (`nets.py:260`):
      2 × [EqConv3x3 + LReLU] then AvgPool ×2 (`lib/blocks.py:173-201`);
      after the first block, fade-in blend in feature domain with
      fromRGB[-2](downscale(input)): (1-α)·x_down + α·x (`nets.py:259-265`)
    → last 4×4 block (`lib/blocks.py:236-268`): minibatch-stddev channel
      concat → EqConv3x3 → LReLU → flatten → EqLinear(16·d0 → d0) → LReLU
    → decision EqLinear(d0 → decision_layer_size) (`nets.py:241-246`)

Block i (1-indexed) maps depths[i] → depths[i-1] channels and halves the
resolution; fromRGB i maps input_dim → depths[i].
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from pggan_tpu.ops.basic import blend, downscale2d, leaky_relu, minibatch_stddev
from pggan_tpu.ops.equalized import (
    equalized_conv2d,
    equalized_linear,
    init_conv_params,
    init_linear_params,
)

_KEY_FROMRGB = 300   # + scale index
_KEY_BLOCK = 400     # + block index (1-based)
_KEY_LAST_CONV = 5
_KEY_LAST_LINEAR = 6
_KEY_DECISION = 7


def init_discriminator_params(rng: jax.Array, *, depths: Sequence[int],
                              scale: int = 0, input_dim: int = 3,
                              decision_layer_size: int = 1,
                              apply_minibatch_norm: bool = True,
                              equalized_lr: bool = True,
                              init_bias_to_zero: bool = True) -> Dict[str, Any]:
    """Build the discriminator pytree for `scale` grown blocks.

    Component RNG keys are stable across growth (same guarantee as the
    generator): init at scale s+1 ⊇ init at scale s.
    """
    kw = dict(equalized=equalized_lr, init_bias_to_zero=init_bias_to_zero)
    d0 = depths[0]
    entry_dim = d0 + 1 if apply_minibatch_norm else d0
    params: Dict[str, Any] = {
        "fromrgb": [init_conv_params(
            jax.random.fold_in(rng, _KEY_FROMRGB), input_dim, d0, 1, **kw)],
        "blocks": [],
        "last_conv": init_conv_params(
            jax.random.fold_in(rng, _KEY_LAST_CONV), entry_dim, d0, 3, **kw),
        "last_linear": init_linear_params(
            jax.random.fold_in(rng, _KEY_LAST_LINEAR), d0 * 16, d0, **kw),
        "decision": init_linear_params(
            jax.random.fold_in(rng, _KEY_DECISION), d0, decision_layer_size, **kw),
    }
    for _ in range(scale):
        params = grow_discriminator_params(
            params, rng, depths=depths, input_dim=input_dim,
            equalized_lr=equalized_lr, init_bias_to_zero=init_bias_to_zero)
    return params


def grow_discriminator_params(params: Dict[str, Any], rng: jax.Array, *,
                              depths: Sequence[int], input_dim: int = 3,
                              equalized_lr: bool = True,
                              init_bias_to_zero: bool = True) -> Dict[str, Any]:
    """Append one scale (functional `Discriminator.add_block`,
    `pggan/nets.py:227-240`)."""
    kw = dict(equalized=equalized_lr, init_bias_to_zero=init_bias_to_zero)
    index = len(params["blocks"]) + 1
    prev_depth = depths[index - 1]
    new_depth = depths[index]
    k = jax.random.fold_in(rng, _KEY_BLOCK + index)
    block = {
        "conv0": init_conv_params(jax.random.fold_in(k, 0), new_depth, new_depth, 3, **kw),
        "conv1": init_conv_params(jax.random.fold_in(k, 1), new_depth, prev_depth, 3, **kw),
    }
    return {
        "fromrgb": list(params["fromrgb"]) + [init_conv_params(
            jax.random.fold_in(rng, _KEY_FROMRGB + index), input_dim, new_depth, 1, **kw)],
        "blocks": list(params["blocks"]) + [block],
        "last_conv": params["last_conv"],
        "last_linear": params["last_linear"],
        "decision": params["decision"],
    }


def discriminator_apply(params: Dict[str, Any], x: jax.Array,
                        alpha: jax.Array, *, slope: float = 0.2,
                        apply_minibatch_norm: bool = True,
                        get_feature: bool = False,
                        compute_dtype=jnp.float32,
                        impl: str = "xla",
                        remat: bool = False,
                        hires_pack: int = 0,
                        input_packed: bool = False
                        ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Forward pass on NHWC input; returns logits [B, decision_layer_size]
    (and the pre-decision feature when `get_feature`, `nets.py:273-276`).

    `hires_pack=N` (bool True ≡ 1) runs the top N levels (fromRGB + the
    N outermost blocks) in the space-to-depth packed representation
    (ops/packed.py): exact same math, but the huge-spatial × tiny-channel
    tensors that trigger XLA's layout-copy pathology at ≥512² never
    exist — each packed level executes at quarter spatial with 4×
    channels; its avgpool exits into the next level, re-packed while
    that level is packed too. Capped at `scale`.
    """
    scale = len(params["blocks"])
    npack = min(int(hires_pack), scale)
    if input_packed and npack < 1:
        raise ValueError("input_packed requires hires_pack >= 1 levels")
    x = x.astype(compute_dtype)

    x_down = None
    if npack >= 1:
        from pggan_tpu.ops.packed import (downscale2d_packed,
                                          downscale2d_repack,
                                          packed_equalized_conv2d,
                                          space_to_depth2)
        # the train step at hires_pack keeps images in the packed domain
        # end-to-end (fade/G-output/D-input) — no transpose round trips
        xp = x if input_packed else space_to_depth2(x)
        if npack >= 2:
            # the blend partner must match the first block's (packed)
            # output representation at level scale-1: pooled + re-packed
            # image in ONE stride-2 constant conv
            x_down = leaky_relu(packed_equalized_conv2d(
                params["fromrgb"][-2], downscale2d_repack(xp),
                compute_dtype=compute_dtype), slope)
        else:
            # downscale2d(x) ≡ subpixel-group mean of the packed image
            x_down = leaky_relu(
                equalized_conv2d(params["fromrgb"][-2],
                                 downscale2d_packed(xp),
                                 compute_dtype=compute_dtype), slope)
        y = leaky_relu(packed_equalized_conv2d(params["fromrgb"][-1], xp,
                                               compute_dtype=compute_dtype),
                       slope)
    else:
        if scale >= 1:
            x_down = leaky_relu(
                equalized_conv2d(params["fromrgb"][-2], downscale2d(x),
                                 compute_dtype=compute_dtype), slope)
        y = leaky_relu(equalized_conv2d(params["fromrgb"][-1], x,
                                        compute_dtype=compute_dtype), slope)

    def block_fn(block, v):
        v = leaky_relu(equalized_conv2d(block["conv0"], v, compute_dtype=compute_dtype), slope)
        v = leaky_relu(equalized_conv2d(block["conv1"], v, compute_dtype=compute_dtype), slope)
        return downscale2d(v)

    def packed_block_fn(block, v, repack):
        from pggan_tpu.ops.packed import (downscale2d_packed,
                                          downscale2d_repack,
                                          packed_equalized_conv2d)
        v = leaky_relu(packed_equalized_conv2d(
            block["conv0"], v, compute_dtype=compute_dtype), slope)
        v = leaky_relu(packed_equalized_conv2d(
            block["conv1"], v, compute_dtype=compute_dtype), slope)
        if repack:
            # next level runs packed too: pool + re-pack in one conv
            return downscale2d_repack(v)
        return downscale2d_packed(v)     # lands unpacked at the next level
    if remat:
        # per-block remat: keeps 1024² activations out of the R1
        # grad-of-grad's live set (see generator.py note)
        block_fn = jax.checkpoint(block_fn)
        packed_block_fn = jax.checkpoint(packed_block_fn, static_argnums=(2,))

    for pos, i in enumerate(reversed(range(scale))):
        if pos < npack:
            y = packed_block_fn(params["blocks"][i], y, pos + 1 < npack)
        else:
            y = block_fn(params["blocks"][i], y)
        if pos == 0:
            y = blend(x_down, y, alpha)

    if apply_minibatch_norm:
        y = minibatch_stddev(y, impl=impl)
    y = leaky_relu(equalized_conv2d(params["last_conv"], y, compute_dtype=compute_dtype), slope)
    # torch flattens NCHW-major (`lib/blocks.py:263`); transpose for the
    # exact weight<->pixel mapping (4×4 here, negligible cost).
    y = y.transpose(0, 3, 1, 2).reshape(y.shape[0], -1)
    y = leaky_relu(equalized_linear(params["last_linear"], y, compute_dtype=compute_dtype), slope)

    out = equalized_linear(params["decision"], y, compute_dtype=compute_dtype)
    if get_feature:
        return out, y
    return out
