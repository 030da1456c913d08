"""Debug / profiling helpers — the `torch_utils/misc.py` analog.

Covers the reference's used surface: `assert_shape` (`misc.py:82`),
`profiled_function` (`misc.py:100-106`, torch profiler record_function →
`jax.named_scope` + XProf annotations), `nan_to_num` (`misc.py:25`),
`constant` caching (trivially free in JAX — constants are jit-cached),
and parameter-consistency checking across devices
(`check_ddp_consistency`, `misc.py:180-194` — unused in the reference but
implemented here as a real replicated-params integrity check).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def assert_shape(tensor, ref_shape: Sequence[Optional[int]]):
    """Shape assertion with None wildcards (`misc.py:82-97`)."""
    if tensor.ndim != len(ref_shape):
        raise AssertionError(
            f"Wrong number of dimensions: got {tensor.ndim}, "
            f"expected {len(ref_shape)}")
    for idx, (size, ref_size) in enumerate(zip(tensor.shape, ref_shape)):
        if ref_size is not None and size != ref_size:
            raise AssertionError(
                f"Wrong size for dimension {idx}: got {size}, "
                f"expected {ref_size}")


def nan_to_num(x, nan: float = 0.0, posinf: Optional[float] = None,
               neginf: Optional[float] = None):
    """`misc.py:25-34` analog."""
    return jnp.nan_to_num(x, nan=nan, posinf=posinf, neginf=neginf)


def profiled_function(fn):
    """Wrap a function in a named scope so it shows up in XProf/Perfetto
    traces (`misc.py:100-106` analog; reference wraps ref-impl ops in
    torch.autograd.profiler.record_function)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.named_scope(fn.__name__):
            return fn(*args, **kwargs)
    return wrapper


def check_replication_consistency(tree, *, atol: float = 0.0) -> None:
    """Verify a replicated pytree holds identical values on every device —
    the honest analog of `check_ddp_consistency` (`misc.py:180-194`).
    Raises AssertionError naming the first divergent leaf."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for keypath, leaf in leaves:
        if not hasattr(leaf, "sharding"):
            continue
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for i, shard in enumerate(shards[1:], start=1):
            if not np.allclose(shards[0], shard, atol=atol, rtol=0):
                name = jax.tree_util.keystr(keypath)
                raise AssertionError(
                    f"replication mismatch at {name}: device 0 vs {i}, "
                    f"max |Δ| = {np.abs(shards[0] - shard).max()}")


def trace_context(logdir: str):
    """Start an XProf trace context: `with trace_context('/tmp/xprof'): ...`
    then inspect in TensorBoard/Perfetto (`jax.profiler.trace`)."""
    return jax.profiler.trace(logdir)


def copy_matching_leaves(src_tree, dst_tree, *, require_all: bool = False):
    """Return dst_tree with every leaf whose pytree path also exists in
    src_tree (same shape) replaced by the src value — the functional
    `copy_params_and_buffers` (`misc.py:153-161`). `require_all=True`
    asserts every dst path is present in src."""
    src = {jax.tree_util.keystr(kp): leaf for kp, leaf
           in jax.tree_util.tree_flatten_with_path(src_tree)[0]}
    leaves, treedef = jax.tree_util.tree_flatten_with_path(dst_tree)
    out = []
    for keypath, leaf in leaves:
        key = jax.tree_util.keystr(keypath)
        if key in src:
            val = src[key]
            if np.shape(val) != np.shape(leaf):
                raise ValueError(f"shape mismatch at {key}: "
                                 f"{np.shape(val)} vs {np.shape(leaf)}")
            out.append(jnp.asarray(val, dtype=getattr(leaf, "dtype", None)))
        elif require_all:
            raise KeyError(f"missing source leaf for {key}")
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def print_tree_summary(params, apply_fn=None, *inputs, file=None) -> str:
    """Parameter/summary table — the `print_module_summary` analog
    (`misc.py:196-264`): one row per pytree leaf (path, shape, #params)
    plus totals, and the output shape via `jax.eval_shape` when an
    apply_fn + example inputs are given (no FLOPs executed)."""
    import io
    buf = io.StringIO()
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    rows = []
    for keypath, leaf in leaves:
        n = int(np.prod(np.shape(leaf))) if np.shape(leaf) else 1
        total += n
        rows.append((jax.tree_util.keystr(keypath), str(np.shape(leaf)), n))
    width = max((len(r[0]) for r in rows), default=10)
    print(f"{'leaf':<{width}}  {'shape':<20}  params", file=buf)
    for name, shape, n in rows:
        print(f"{name:<{width}}  {shape:<20}  {n}", file=buf)
    print(f"{'TOTAL':<{width}}  {'':<20}  {total}", file=buf)
    if apply_fn is not None:
        out = jax.eval_shape(apply_fn, params, *inputs)
        shapes = jax.tree.map(lambda s: tuple(s.shape), out)
        print(f"output shape(s): {shapes}", file=buf)
    text = buf.getvalue()
    print(text, end="", file=file)
    return text
