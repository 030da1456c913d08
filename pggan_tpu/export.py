"""Serving export: self-contained, versioned StableHLO sampling artifacts.

A deployment story the reference does not have: its checkpoints are torch
pickles that need the full source tree (and matching class definitions) at
load time (`lib/checkpoint.py:24-25`; the vendored `persistence.py` exists
precisely because that breaks under code drift). Here the trained
generator is exported with `jax.export` into ONE portable artifact:

  * the forward graph is captured as serialized StableHLO — the weights
    are baked in as constants, so serving needs NO pggan_tpu code and no
    checkpoint plumbing, just jax;
  * the batch dimension is symbolic by default, so one artifact serves
    any batch size;
  * `platforms` lists every target backend the artifact may run on
    (cross-platform lowering is client-side — a CPU host can produce a
    TPU artifact);
  * jax's export versioning gives forward/backward compatibility
    guarantees that pickles cannot.

Export is pure client-side lowering (no device compilation happens until
the artifact is first called), so it is safe on any backend.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Union

import os

import numpy as np


def export_generator(params: Dict[str, Any], *,
                     latent_dim: int,
                     alpha: float = 1.0,
                     batch: Optional[int] = None,
                     platforms: Sequence[str] = ("cpu", "tpu"),
                     path: Optional[str] = None,
                     **apply_kwargs) -> bytes:
    """Serialize `z ↦ generator_apply(params, z, alpha)` to StableHLO.

    The returned bytes (also written to `path` when given) embed the
    weights as constants and accept `[b, latent_dim]` float32 latents —
    `b` symbolic when `batch` is None, pinned otherwise. `alpha` is baked
    in (a served model's fade state is fixed; pass the checkpoint's final
    alpha for mid-fade exports). Extra `apply_kwargs` (slope,
    apply_pixel_norm, last_activation, compute_dtype, ...) forward to
    `generator_apply`.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexp
    from pggan_tpu.models import generator_apply

    def fn(z):
        return generator_apply(params, z, jnp.float32(alpha), **apply_kwargs)

    if batch is None:
        (b,) = jexp.symbolic_shape("b")
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, int(latent_dim)), jnp.float32)
    exported = jexp.export(jax.jit(fn), platforms=list(platforms))(spec)
    data = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data


def load_exported(src: Union[str, bytes]):
    """Deserialize an artifact (path or bytes) → `jax.export.Exported`.

    Sample with `exported.call(z)` (jit-compatible; compiles on first
    call for the local backend, which must be in the artifact's
    `platforms`).
    """
    from jax import export as jexp

    if isinstance(src, (str, os.PathLike)):
        with open(src, "rb") as f:
            src = f.read()
    return jexp.deserialize(bytearray(src))


def sample(src: Union[str, bytes], latents: np.ndarray) -> np.ndarray:
    """One-call serving helper: load artifact, run latents, return uint8
    images (denormalized ×0.5+0.5 → [0,255], the reference demo's
    convention, `demo.py:62`)."""
    import jax.numpy as jnp

    exported = load_exported(src)
    imgs = np.asarray(exported.call(jnp.asarray(latents, jnp.float32)))
    return (np.clip(imgs * 0.5 + 0.5, 0.0, 1.0) * 255.0).astype(np.uint8)
