"""Checkpoint save/restore for parameter pytrees + optimizer state +
progressive schedule + config.

Capability parity with the reference (`lib/checkpoint.py`,
`pggan/model.py:50-101`):
  * per-net files  {save_root}/{run_id}/ckpt/{G|D}_{step}.npz  plus a
    `_latest` alias (reference `lib/checkpoint.py:27-34`)
  * the ckpt carries args + global_step + the full progressive schedule
    (alpha, alpha_index, alpha_jump_value, next_alpha_jump_step,
    scale_index, next_scale_jump_step) so restore can re-grow the nets
    BEFORE loading weights (reference `pggan/model.py:54-64,79-101`)
  * `ckpt_step=None` → `latest` (reference `lib/checkpoint.py:5-9`)
  * load failure → None, caller decides (reference returns 0 and then
    crashes on subscript, `pggan/model.py:79` — we fail loudly instead)
  * strict key-set check on demand (the reference's only structural test,
    `demo.py:40-44`)

Format: a single .npz per net (zip of npy arrays keyed by pytree path)
plus an embedded JSON metadata blob. Pure numpy/JSON — no pickle, no
framework-version coupling; restore targets a freshly-initialized template
pytree and fills leaves by path, which makes structure drift explicit.
The reference's torch `load_state_dict(strict=False)` behavior is the
`strict=False` path here. The reference restore off-by-one (growing with
`depths[0:scale]` instead of `depths[1:scale+1]`, `pggan/model.py:89-91`)
is documented and fixed in the trainer.
"""

from __future__ import annotations

import io
import json
import os
import shutil
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _path_str(keypath) -> str:
    parts = []
    for entry in keypath:
        if hasattr(entry, "key"):
            parts.append(str(entry.key))
        elif hasattr(entry, "idx"):
            parts.append(str(entry.idx))
        elif hasattr(entry, "name"):
            parts.append(str(entry.name))
        else:
            parts.append(str(entry))
    return "/".join(parts)


def tree_to_arrays(tree) -> Dict[str, np.ndarray]:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for keypath, leaf in leaves:
        out[_path_str(keypath)] = np.asarray(leaf)
    return out


def arrays_to_tree(template, arrays: Dict[str, np.ndarray], *, strict: bool = True):
    """Fill `template`'s leaves from `arrays` by pytree path.

    strict=True: key sets must match exactly (demo.py:40-44 analog).
    strict=False: missing keys keep the template leaf (torch
    `strict=False` analog); extra keys are ignored.
    """
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    template_keys = {_path_str(kp) for kp, _ in leaves}
    if strict:
        missing = template_keys - set(arrays)
        extra = set(arrays) - template_keys
        if missing or extra:
            raise KeyError(
                f"checkpoint/template key mismatch: missing={sorted(missing)[:5]} "
                f"extra={sorted(extra)[:5]} (strict=True)")
    new_leaves = []
    for keypath, leaf in leaves:
        key = _path_str(keypath)
        if key in arrays:
            arr = arrays[key]
            if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(np.shape(leaf)):
                raise ValueError(
                    f"shape mismatch for {key}: ckpt {arr.shape} vs template {np.shape(leaf)}")
            new_leaves.append(
                jax.numpy.asarray(arr, dtype=getattr(leaf, "dtype", arr.dtype)))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def ckpt_dir(save_root: str, run_id: str) -> str:
    return os.path.join(str(save_root), str(run_id), "ckpt")


def save_checkpoint(save_root: str, run_id: str, name: str, global_step: int,
                    *, params, opt_state=None, meta: Optional[Dict] = None):
    """Write {name}_{step}.npz and refresh {name}_latest.npz atomically."""
    directory = ckpt_dir(save_root, run_id)
    os.makedirs(directory, exist_ok=True)

    payload = {}
    for key, arr in tree_to_arrays(params).items():
        payload[f"params/{key}"] = arr
    if opt_state is not None:
        for key, arr in tree_to_arrays(opt_state).items():
            payload[f"opt/{key}"] = arr
    meta = dict(meta or {})
    meta["global_step"] = int(global_step)
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)

    path = os.path.join(directory, f"{name}_{global_step}.npz")
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    # Atomic latest-alias refresh: a crash mid-copy must never leave a
    # truncated {name}_latest.npz — that is exactly the file the default
    # resume path (ckpt_step=None) reads.
    latest = os.path.join(directory, f"{name}_latest.npz")
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f_out, open(path, "rb") as f_in:
            shutil.copyfileobj(f_in, f_out)
        os.replace(tmp, latest)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def load_checkpoint(save_root: str, ckpt_id: str, name: str,
                    ckpt_step: Optional[int] = None
                    ) -> Optional[Tuple[Dict[str, np.ndarray],
                                        Dict[str, np.ndarray], Dict]]:
    """Returns (param_arrays, opt_arrays, meta) or None if absent.

    `ckpt_step=None` resolves to the `latest` alias (`lib/checkpoint.py:6-9`).
    """
    step_tag = "latest" if ckpt_step is None else str(ckpt_step)
    path = os.path.join(ckpt_dir(save_root, ckpt_id), f"{name}_{step_tag}.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as data:
        params, opt = {}, {}
        meta: Dict = {}
        for key in data.files:
            if key == "__meta__":
                meta = json.loads(bytes(data[key].tobytes()).decode("utf-8"))
            elif key.startswith("params/"):
                params[key[len("params/"):]] = data[key]
            elif key.startswith("opt/"):
                opt[key[len("opt/"):]] = data[key]
    return params, opt, meta
