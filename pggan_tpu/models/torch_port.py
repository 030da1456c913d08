"""Import reference (PyTorch) PGGAN checkpoints into pggan_tpu pytrees.

The reference saves `{save_root}/{run_id}/ckpt/{G|D}_{step}.pt` dicts
containing the torch `state_dict` plus the progressive-schedule scalars
(`pggan/model.py:50-67`, `lib/checkpoint.py:22-34`). A user migrating from
the reference carries those files; these converters map them losslessly
onto this framework's parameter pytrees so training can resume (or
sampling run) from a reference-trained model.

Key-name surface being mapped (reference module tree, `pggan/nets.py` +
`lib/blocks.py` + `lib/layers.py`):

  Generator state_dict                         → pytree path
    latent_format_layer.module.{weight,bias}     format/{w,b}
    first_block.block.0.module.{weight,bias}     first_conv/{w,b}
    blocks.{i}.block.{j}.module.{weight,bias}    blocks/{i}/conv{0,1}/{w,b}
    toRGB_blocks.{i}.toRGB.module.{weight,bias}  torgb/{i}/{w,b}

  Discriminator state_dict                     → pytree path
    fromRGB_blocks.{i}.fromRGB.module.*          fromrgb/{i}/*
    blocks.{i}.block.{j}.module.*                blocks/{i}/conv{0,1}/*
    minibatch_normalization_block.conv.module.*  last_conv/*
    minibatch_normalization_block.linear.module.* last_linear/*
    decision_layer.module.*                      decision/*

Layout transforms: conv weights OIHW → HWIO; linear weights [out,in] →
[in,out]. The discriminator's flatten before `last_linear` is NCHW-major
in both implementations (`lib/blocks.py:263-266`; discriminator.py
transposes to match), so `last_linear` needs no index permutation beyond
the plain transpose. The per-layer He constants are NOT in torch
state_dicts (`lib/layers.py:56` keeps them plain float attributes); they
are recomputed here from the torch weight shapes — fan_in =
prod(weight.shape[1:]) (`lib/layers.py:17-25`) — exactly as the reference
would at construction.

Sequential indices inside a block depend on whether PixelNorm modules were
interleaved (`lib/blocks.py:119-141`: convs at {0,3} with norm, {0,2}
without), so convs are discovered by scanning the key set rather than by
hard-coded indices.

In-memory tensors are accepted as anything numpy can view (torch CPU
tensors included via `.numpy()` when present); no torch import happens
here — `tools/import_torch_ckpt.py` owns file loading.
"""

from __future__ import annotations

import math
import re
from typing import Any, Dict, Mapping

import numpy as np


def _to_numpy(value) -> np.ndarray:
    if hasattr(value, "detach"):        # torch tensor
        value = value.detach().cpu().numpy()
    return np.asarray(value, dtype=np.float32)


def _he_scale(torch_weight: np.ndarray, equalized_lr: bool) -> np.ndarray:
    """He constant from the torch layout: fan_in = prod(size[1:])
    (`lib/layers.py:17-25`); identity when equalized LR is off."""
    if not equalized_lr:
        return np.float32(1.0)
    fan_in = int(np.prod(torch_weight.shape[1:]))
    return np.float32(math.sqrt(2.0 / fan_in))


def _conv(out: Dict[str, np.ndarray], path: str, sd: Mapping[str, Any],
          prefix: str, equalized_lr: bool):
    w = _to_numpy(sd[f"{prefix}.weight"])           # OIHW
    out[f"{path}/w"] = np.transpose(w, (2, 3, 1, 0))  # → HWIO
    out[f"{path}/b"] = _to_numpy(sd[f"{prefix}.bias"])
    out[f"{path}/scale"] = _he_scale(w, equalized_lr)


def _linear(out: Dict[str, np.ndarray], path: str, sd: Mapping[str, Any],
            prefix: str, equalized_lr: bool):
    w = _to_numpy(sd[f"{prefix}.weight"])           # [out, in]
    out[f"{path}/w"] = np.transpose(w)               # → [in, out]
    out[f"{path}/b"] = _to_numpy(sd[f"{prefix}.bias"])
    out[f"{path}/scale"] = _he_scale(w, equalized_lr)


def _block_conv_prefixes(sd: Mapping[str, Any], index: int) -> list:
    """Conv prefixes of `blocks.{index}`, in Sequential order (the indices
    shift with `apply_pixel_norm`, `lib/blocks.py:119-141`)."""
    pattern = re.compile(
        rf"^blocks\.{index}\.block\.(\d+)\.module\.weight$")
    js = sorted(int(m.group(1)) for k in sd if (m := pattern.match(k)))
    return [f"blocks.{index}.block.{j}.module" for j in js]


def _count(sd: Mapping[str, Any], pattern: str) -> int:
    regex = re.compile(pattern)
    indices = {int(m.group(1)) for k in sd if (m := regex.match(k))}
    if indices and indices != set(range(max(indices) + 1)):
        raise KeyError(f"non-contiguous module indices for {pattern}: "
                       f"{sorted(indices)}")
    return len(indices)


def _check_consumed(sd: Mapping[str, Any], consumed: set, what: str):
    leftover = sorted(set(sd) - consumed)
    if leftover:
        raise KeyError(
            f"unrecognized {what} state_dict keys (not a reference PGGAN "
            f"checkpoint, or an architecture variant this converter does "
            f"not know): {leftover[:8]}")


def convert_generator_state_dict(sd: Mapping[str, Any], *,
                                 equalized_lr: bool = True
                                 ) -> Dict[str, np.ndarray]:
    """Reference `Generator.state_dict()` → pytree-path arrays.

    Feed the result to `utils.checkpoint.arrays_to_tree` against an
    `init_generator_params(..., scale=n_blocks)` template with
    `strict=True` — every torch tensor must land, every template leaf must
    be filled.
    """
    out: Dict[str, np.ndarray] = {}
    consumed: set = set()

    _linear(out, "format", sd, "latent_format_layer.module", equalized_lr)
    consumed |= {"latent_format_layer.module.weight",
                 "latent_format_layer.module.bias"}

    first = [k for k in sd
             if re.match(r"^first_block\.block\.\d+\.module\.weight$", k)]
    if len(first) != 1:
        raise KeyError(f"expected exactly one first_block conv "
                       f"(`lib/blocks.py:119-141`, is_first=True), got {first}")
    first_prefix = first[0][: -len(".weight")]
    _conv(out, "first_conv", sd, first_prefix, equalized_lr)
    consumed |= {f"{first_prefix}.weight", f"{first_prefix}.bias"}

    n_blocks = _count(sd, r"^blocks\.(\d+)\.")
    for i in range(n_blocks):
        prefixes = _block_conv_prefixes(sd, i)
        if len(prefixes) != 2:
            raise KeyError(f"generator blocks.{i}: expected 2 convs "
                           f"(`lib/blocks.py:119-141`), found {prefixes}")
        for slot, prefix in zip(("conv0", "conv1"), prefixes):
            _conv(out, f"blocks/{i}/{slot}", sd, prefix, equalized_lr)
            consumed |= {f"{prefix}.weight", f"{prefix}.bias"}

    n_torgb = _count(sd, r"^toRGB_blocks\.(\d+)\.")
    if n_torgb != n_blocks + 1:
        raise KeyError(f"toRGB count {n_torgb} != blocks+1 ({n_blocks + 1}) "
                       f"(`pggan/nets.py:102-119` grows them in lockstep)")
    for i in range(n_torgb):
        prefix = f"toRGB_blocks.{i}.toRGB.module"
        _conv(out, f"torgb/{i}", sd, prefix, equalized_lr)
        consumed |= {f"{prefix}.weight", f"{prefix}.bias"}

    _check_consumed(sd, consumed, "generator")
    return out


def convert_discriminator_state_dict(sd: Mapping[str, Any], *,
                                     equalized_lr: bool = True
                                     ) -> Dict[str, np.ndarray]:
    """Reference `Discriminator.state_dict()` → pytree-path arrays."""
    out: Dict[str, np.ndarray] = {}
    consumed: set = set()

    n_fromrgb = _count(sd, r"^fromRGB_blocks\.(\d+)\.")
    for i in range(n_fromrgb):
        prefix = f"fromRGB_blocks.{i}.fromRGB.module"
        _conv(out, f"fromrgb/{i}", sd, prefix, equalized_lr)
        consumed |= {f"{prefix}.weight", f"{prefix}.bias"}

    n_blocks = _count(sd, r"^blocks\.(\d+)\.")
    if n_fromrgb != n_blocks + 1:
        raise KeyError(f"fromRGB count {n_fromrgb} != blocks+1 "
                       f"({n_blocks + 1}) (`pggan/nets.py:227-239`)")
    for i in range(n_blocks):
        prefixes = _block_conv_prefixes(sd, i)
        if len(prefixes) != 2:
            raise KeyError(f"discriminator blocks.{i}: expected 2 convs "
                           f"(`lib/blocks.py:173-195`), found {prefixes}")
        for slot, prefix in zip(("conv0", "conv1"), prefixes):
            _conv(out, f"blocks/{i}/{slot}", sd, prefix, equalized_lr)
            consumed |= {f"{prefix}.weight", f"{prefix}.bias"}

    _conv(out, "last_conv", sd, "minibatch_normalization_block.conv.module",
          equalized_lr)
    _linear(out, "last_linear", sd,
            "minibatch_normalization_block.linear.module", equalized_lr)
    _linear(out, "decision", sd, "decision_layer.module", equalized_lr)
    consumed |= {
        "minibatch_normalization_block.conv.module.weight",
        "minibatch_normalization_block.conv.module.bias",
        "minibatch_normalization_block.linear.module.weight",
        "minibatch_normalization_block.linear.module.bias",
        "decision_layer.module.weight",
        "decision_layer.module.bias",
    }

    _check_consumed(sd, consumed, "discriminator")
    return out


def reference_schedule_meta(ckpt_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference ckpt schedule scalars (`pggan/model.py:54-64`) → the
    `meta['schedule']` dict `ProgressiveSchedule.load_state_dict` expects.

    `alpha_G`/`alpha_D` are maintained in lockstep by the reference
    (`pggan/model.py:176-194` sets both); G's is taken, a mismatch raises.
    """
    alpha_g = float(ckpt_dict["alpha_G"])
    alpha_d = float(ckpt_dict["alpha_D"])
    if alpha_g != alpha_d:
        raise ValueError(f"reference checkpoint has alpha_G={alpha_g} != "
                         f"alpha_D={alpha_d}; cannot map to the single-alpha "
                         f"schedule")
    return {
        "scale_index": int(ckpt_dict["scale_index"]),
        "alpha": alpha_g,
        "alpha_index": int(ckpt_dict["alpha_index"]),
        "alpha_jump_value": float(ckpt_dict["alpha_jump_value"]),
        "next_scale_jump_step": int(ckpt_dict["next_scale_jump_step"]),
        "next_alpha_jump_step": int(ckpt_dict["next_alpha_jump_step"]),
    }
