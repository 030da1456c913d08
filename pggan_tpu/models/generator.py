"""Progressive generator as a pure function of a parameter pytree.

Architecture parity with the reference `pggan/nets.py:10-161`:

  latent [B, latent_dim]
    → PixelNorm (`nets.py:124-125`)
    → EqualizedLinear(latent_dim → 16 * depths[0]) + LReLU (`nets.py:129`)
    → reshape [B, 4, 4, depths[0]] + PixelNorm (`nets.py:130-133`)
    → first block: EqConv3x3 + LReLU + PixelNorm (single conv — the
      `is_first=True` branch of `lib/blocks.py:119-141`)
    → per grown block i (1..scale): nearest upscale ×2, then
      2 × [EqConv3x3 + LReLU + PixelNorm] (`lib/blocks.py:143-149`)
    → toRGB 1x1 conv per scale (`lib/blocks.py:153-170`)
    → fade-in blend in RGB domain: (1-α)·upscale(toRGB[-2](penultimate))
      + α·toRGB[-1](x) (`nets.py:140-156`)

TPU-native differences: NHWC layout, static graph per scale (growth is
pytree surgery between jitted steps, not module mutation), and parameters
live in a plain nested dict so `jax.grad`/optax/checkpointing compose.

Block i (1-indexed) has channel depth `depths[i]`; the first 4×4 block has
`depths[0]` (matching `pggan/model.py:163-164` growth order; the reference's
checkpoint-restore off-by-one, `pggan/model.py:89-91`, is NOT replicated).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from pggan_tpu.ops.basic import (blend, leaky_relu, lrelu_pixel_norm,
                                 pixel_norm, upscale2d)
from pggan_tpu.ops.equalized import (
    equalized_conv2d,
    equalized_linear,
    init_conv_params,
    init_linear_params,
)

# RNG component-id namespaces (stable across growth).
_KEY_FORMAT = 0
_KEY_FIRST = 1
_KEY_BLOCK = 100     # + block index (1-based)
_KEY_TORGB = 200     # + scale index (0-based)


def _block_key(rng: jax.Array, index: int) -> jax.Array:
    return jax.random.fold_in(rng, _KEY_BLOCK + index)


def _torgb_key(rng: jax.Array, index: int) -> jax.Array:
    return jax.random.fold_in(rng, _KEY_TORGB + index)


def init_generator_params(rng: jax.Array, *, latent_dim: int,
                          depths: Sequence[int], scale: int = 0,
                          output_dim: int = 3, equalized_lr: bool = True,
                          init_bias_to_zero: bool = True) -> Dict[str, Any]:
    """Build the full generator pytree for `scale` grown blocks.

    RNG keys are derived per component id, so
    `init_generator_params(rng, scale=s)` is a strict prefix of
    `init_generator_params(rng, scale=s+1)` — growth and fresh init agree.
    """
    kw = dict(equalized=equalized_lr, init_bias_to_zero=init_bias_to_zero)
    d0 = depths[0]
    params: Dict[str, Any] = {
        "format": init_linear_params(
            jax.random.fold_in(rng, _KEY_FORMAT), latent_dim, 16 * d0, **kw),
        "first_conv": init_conv_params(
            jax.random.fold_in(rng, _KEY_FIRST), d0, d0, 3, **kw),
        "blocks": [],
        "torgb": [init_conv_params(_torgb_key(rng, 0), d0, output_dim, 1, **kw)],
    }
    for i in range(1, scale + 1):
        params = grow_generator_params(
            params, rng, depths=depths, output_dim=output_dim,
            equalized_lr=equalized_lr, init_bias_to_zero=init_bias_to_zero)
    return params


def grow_generator_params(params: Dict[str, Any], rng: jax.Array, *,
                          depths: Sequence[int], output_dim: int = 3,
                          equalized_lr: bool = True,
                          init_bias_to_zero: bool = True) -> Dict[str, Any]:
    """Append one scale: a new [conv0, conv1] block and its toRGB head.

    Pure pytree surgery — the functional analog of `Generator.add_block`
    (`pggan/nets.py:102-119`). Existing leaves are reused by reference.
    """
    kw = dict(equalized=equalized_lr, init_bias_to_zero=init_bias_to_zero)
    index = len(params["blocks"]) + 1          # 1-based block index
    prev_depth = depths[index - 1]
    new_depth = depths[index]
    k = _block_key(rng, index)
    block = {
        "conv0": init_conv_params(jax.random.fold_in(k, 0), prev_depth, new_depth, 3, **kw),
        "conv1": init_conv_params(jax.random.fold_in(k, 1), new_depth, new_depth, 3, **kw),
    }
    return {
        "format": params["format"],
        "first_conv": params["first_conv"],
        "blocks": list(params["blocks"]) + [block],
        "torgb": list(params["torgb"]) + [
            init_conv_params(_torgb_key(rng, index), new_depth, output_dim, 1, **kw)],
    }


def generator_apply(params: Dict[str, Any], latent: jax.Array,
                    alpha: jax.Array, *, slope: float = 0.2,
                    apply_pixel_norm: bool = True,
                    last_activation: Optional[str] = None,
                    compute_dtype=jnp.float32,
                    impl: str = "xla",
                    remat: bool = False,
                    fused_scale="dilated",
                    hires_pack: int = 0,
                    output_packed: bool = False) -> jax.Array:
    """Forward pass. Returns NHWC images in [-1, 1] (no last activation by
    default, matching `generator_last_activation: null` in configs.yaml).

    `alpha` is a traced scalar — fade-in progress never triggers a retrace.
    The number of grown blocks is static (pytree structure), so each scale
    compiles its own XLA program.
    """
    scale = len(params["blocks"])
    d0 = params["first_conv"]["w"].shape[2]
    x = latent.astype(compute_dtype)

    def pn(v):
        return pixel_norm(v, impl=impl) if apply_pixel_norm else v

    def act(v):
        """Conv epilogue: LReLU then PixelNorm, fused where impl allows."""
        if apply_pixel_norm:
            return lrelu_pixel_norm(v, slope, impl=impl)
        return leaky_relu(v, slope)

    x = pn(x)
    x = leaky_relu(equalized_linear(params["format"], x, compute_dtype=compute_dtype), slope)
    # torch reshapes NCHW-major ([B, C, 4, 4]); transpose keeps the exact
    # weight<->pixel mapping so golden-parity tests can port torch weights.
    x = x.reshape(-1, d0, 4, 4).transpose(0, 2, 3, 1)
    x = pn(x)

    # First (4x4) block: single conv.
    x = act(equalized_conv2d(params["first_conv"], x, compute_dtype=compute_dtype))

    def block_fn(block, v):
        # Exact upscale+conv fusion at low res (ops/fused_scale.py).
        # 'auto': fuse only lane-bound blocks (cout < 128) — measured on
        # v5e: big win at 512/1024px (16-64 ch; +25% at 1024, unlocks
        # batch 4), slight loss on the wide low-res blocks.
        cout = block["conv0"]["w"].shape[-1]
        if fused_scale == "dilated":
            fuse = "dilated"
        elif isinstance(fused_scale, bool):
            fuse = fused_scale
        elif fused_scale == "auto":
            fuse = cout < 128
        else:                       # numeric threshold: fuse when cout <= N
            fuse = cout <= int(fused_scale)
        if fuse == "dilated":
            from pggan_tpu.ops.fused_scale import upscale_conv3x3_dilated
            v = upscale_conv3x3_dilated(block["conv0"], v,
                                        compute_dtype=compute_dtype)
        elif fuse:
            from pggan_tpu.ops.fused_scale import upscale_conv3x3
            v = upscale_conv3x3(block["conv0"], v, compute_dtype=compute_dtype)
        else:
            v = upscale2d(v)
            v = equalized_conv2d(block["conv0"], v, compute_dtype=compute_dtype)
        v = act(v)
        v = act(equalized_conv2d(block["conv1"], v, compute_dtype=compute_dtype))
        return v
    def packed_block_fn(block, v):
        """The top block in the packed representation (ops/packed.py):
        conv0 stays the quarter-res 4C-group form WITHOUT depth-to-space,
        conv1/lrelu/pixel_norm run packed — the full-res tiny-channel
        tensor that triggers XLA's ≥512² layout copies never exists."""
        from pggan_tpu.ops.fused_scale import upscale_conv3x3_packed
        from pggan_tpu.ops.packed import (packed_equalized_conv2d,
                                          pixel_norm_packed)

        def act_packed(u):
            u = leaky_relu(u, slope)
            return pixel_norm_packed(u) if apply_pixel_norm else u

        v = upscale_conv3x3_packed(block["conv0"], v,
                                   compute_dtype=compute_dtype)
        v = act_packed(v)
        v = packed_equalized_conv2d(block["conv1"], v,
                                    compute_dtype=compute_dtype)
        return act_packed(v)
    if remat:
        # rematerialize per-block activations in the backward pass — trades
        # FLOPs for HBM at high resolutions (1024² activations don't fit
        # alongside the R1 double-backward otherwise)
        block_fn = jax.checkpoint(block_fn)
        packed_block_fn = jax.checkpoint(packed_block_fn)

    npack = min(int(hires_pack), scale)     # top-N blocks run packed
    penultimate = x
    penultimate_packed = False
    for i, block in enumerate(params["blocks"]):
        penultimate = x
        penultimate_packed = i > scale - npack
        if i >= scale - npack:
            if penultimate_packed:
                # previous packed block emitted PACKED at this block's
                # input resolution — one controlled unpack transpose
                from pggan_tpu.ops.fused_scale import depth_to_space2
                x = depth_to_space2(x)
            x = packed_block_fn(block, x)       # PACKED [B, h, w, 4C]
        else:
            x = block_fn(block, x)

    if npack >= 1:
        from pggan_tpu.ops.fused_scale import depth_to_space2
        from pggan_tpu.ops.packed import (packed_equalized_conv2d,
                                          upscale2d_packed)
        outp = packed_equalized_conv2d(params["torgb"][-1], x,
                                       compute_dtype=compute_dtype)
        if scale >= 1:
            if penultimate_packed:
                # toRGB the packed penultimate, unpack the (tiny) RGB
                # image, then group-broadcast it up to the top level
                prev_img = depth_to_space2(packed_equalized_conv2d(
                    params["torgb"][-2], penultimate,
                    compute_dtype=compute_dtype))
            else:
                prev_img = equalized_conv2d(params["torgb"][-2], penultimate,
                                            compute_dtype=compute_dtype)
            # RGB-domain fade (`nets.py:140-156`) in the packed image
            # domain; ONE unpack transpose materializes the final image
            # (skipped when the caller consumes packed images directly —
            # the train step at hires_pack feeds D packed end-to-end)
            outp = blend(upscale2d_packed(prev_img), outp, alpha)
        out = outp if output_packed else depth_to_space2(outp)
    elif output_packed:
        raise ValueError("output_packed requires hires_pack >= 1 levels")
    else:
        out = equalized_conv2d(params["torgb"][-1], x,
                               compute_dtype=compute_dtype)
        if scale >= 1:
            x_up = upscale2d(equalized_conv2d(params["torgb"][-2], penultimate,
                                              compute_dtype=compute_dtype))
            out = blend(x_up, out, alpha)

    if last_activation == "tanh":
        out = jnp.tanh(out)
    elif last_activation == "sigmoid":
        out = jax.nn.sigmoid(out)
    elif last_activation not in (None, "", "none", "linear"):
        raise ValueError(f"unsupported last activation {last_activation!r}")
    return out


def generator_output_resolution(params: Dict[str, Any]) -> int:
    """Side length of the generated image: 4 · 2^scale (`nets.py:95-100`)."""
    return 4 * (2 ** len(params["blocks"]))
