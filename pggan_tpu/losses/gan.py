"""GAN losses: BCE, R1, WGAN-GP, drift, softplus, hinge.

Parity with the reference loss zoo (`lib/loss.py:54-141`) and the PGGAN
loss collector (`pggan/loss.py`). Gradient penalties are computed with
`jax.grad` composition — the grad-of-grad that required torch's
conv2d_gradfix machinery is native here.

Reference-behavior notes, preserved faithfully unless flagged:
  * The active D loss is BCE(real,1) + BCE(fake,0) + R1 (`pggan/loss.py:16-27`)
    — despite the class being named WGANGPLoss.
  * The reference's R1 call site passes the *BCE loss* (not the logits) as
    `d_out` (`pggan/loss.py:23`: `get_r1_reg(L_D_real, img_real)`), i.e. it
    penalizes ‖∇ₓ BCE(D(x),1)‖² rather than the published ‖∇ₓ D(x)‖².
    Both variants are provided (`r1_target='loss'` reproduces the reference
    call site exactly; `'logits'` is the published R1 and our default).
  * WGAN-GP (`pggan/loss.py:54-92`) and drift (`:94-100`) exist in the
    reference but return `.item()` floats (no gradient flow). We implement
    them as real differentiable losses — the documented fix.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, target: int) -> jax.Array:
    """Mean binary cross-entropy with logits against a constant target
    (reference `lib/loss.py:119-123`, F.binary_cross_entropy_with_logits).
    """
    assert target in (0, 1)
    logits = logits.astype(jnp.float32)
    # Numerically stable: max(x,0) - x*t + log(1+exp(-|x|))
    t = float(target)
    loss = jnp.maximum(logits, 0.0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def softplus_loss(logit: jax.Array, is_real: bool = True) -> jax.Array:
    """Non-saturating softplus GAN loss (`lib/loss.py:95-99`)."""
    x = logit.astype(jnp.float32)
    return jnp.mean(jax.nn.softplus(-x if is_real else x))


def hinge_loss(logit: jax.Array, positive: bool = True) -> jax.Array:
    """Hinge GAN loss (`lib/loss.py:108-112`)."""
    x = logit.astype(jnp.float32)
    return jnp.mean(jax.nn.relu(1.0 - x) if positive else jax.nn.relu(x + 1.0))


def r1_penalty(d_fn: Callable[[jax.Array], jax.Array], x_real: jax.Array,
               *, target: str = "logits") -> jax.Array:
    """Zero-centered gradient penalty on reals (`lib/loss.py:125-135`):
    0.5 · E_b[ Σ (∇ₓ f(x))² ].

    target='logits': f = Σ D(x)  (published R1, Mescheder et al.)
    target='loss'  : f = BCE(D(x), 1)  (the reference's literal call site,
                     `pggan/loss.py:23`)
    """
    if target == "logits":
        f = lambda im: jnp.sum(d_fn(im).astype(jnp.float32))
    elif target == "loss":
        f = lambda im: bce_with_logits(d_fn(im), 1)
    else:
        raise ValueError(f"unknown r1 target {target!r}")
    grad = jax.grad(f)(x_real).astype(jnp.float32)
    per_sample = jnp.sum(jnp.square(grad).reshape(grad.shape[0], -1), axis=1)
    return 0.5 * jnp.mean(per_sample)


def gradient_penalty(d_fn: Callable[[jax.Array], jax.Array],
                     x_real: jax.Array, x_fake: jax.Array,
                     eps: jax.Array, w_gp: float) -> jax.Array:
    """WGAN-GP eps-interpolated penalty (`pggan/loss.py:54-92`):
    Σ_b (‖∇ D(eps·real + (1-eps)·fake)‖₂ − 1)² · W_gp.

    `eps` is a [B] uniform sample (the reference draws one scalar per
    sample and broadcasts, `pggan/loss.py:70-72`). Note the reference uses
    a **sum** over the batch, not a mean — preserved.
    """
    b = x_real.shape[0]
    eps = eps.reshape((b,) + (1,) * (x_real.ndim - 1)).astype(x_real.dtype)
    interp = eps * x_real + (1.0 - eps) * x_fake

    def f(im):
        return jnp.sum(d_fn(im)[:, 0].astype(jnp.float32))

    grad = jax.grad(f)(interp).astype(jnp.float32)
    norms = jnp.sqrt(jnp.sum(jnp.square(grad).reshape(b, -1), axis=1))
    return jnp.sum(jnp.square(norms - 1.0)) * w_gp


def drift_loss(pred_real: jax.Array, w_drift: float) -> jax.Array:
    """Keep D outputs near 0: Σ pred_real² · W_drift (`pggan/loss.py:94-100`,
    with the no-gradient `.item()` bug fixed — here it actually trains)."""
    return jnp.sum(jnp.square(pred_real.astype(jnp.float32))) * w_drift


def generator_loss(pred_fake: jax.Array, w_adv: float) -> jax.Array:
    """G adversarial loss: W_adv · BCE(D(G(z)), 1) (`pggan/loss.py:5-14`)."""
    return w_adv * bce_with_logits(pred_fake, 1)


# ---------------------------------------------------------------------------
# Reconstruction / identity / attribute losses — the rest of the static
# loss zoo (`lib/loss.py:62-91`), used by the face-swap trainers the
# reference bundles. Formula-exact ports; all reduce to scalars in f32.
# ---------------------------------------------------------------------------


def id_loss(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Cosine identity loss: mean(1 − cos_sim(a, b, dim=1))
    (`lib/loss.py:62-63`). Inputs [B, D] embeddings; torch's
    cosine_similarity clamps each norm at eps=1e-8."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    na = jnp.maximum(jnp.linalg.norm(a, axis=1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=1), eps)
    cos = jnp.sum(a * b, axis=1) / (na * nb)
    return jnp.mean(1.0 - cos)


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    """Mean absolute error (`lib/loss.py:71-73`, torch.nn.L1Loss)."""
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def l2_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    """Mean squared error (`lib/loss.py:75-77`, torch.nn.MSELoss)."""
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def l1_loss_with_same_person(a: jax.Array, b: jax.Array,
                             same_person: jax.Array,
                             batch_per_gpu: int) -> jax.Array:
    """Σ_b( mean_b|a−b| · same_person_b ) / (Σ same_person + 1e-6)
    (`lib/loss.py:79-80`): per-sample mean abs diff, masked to same-person
    pairs, normalized by the mask count."""
    d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
    per = jnp.mean(d.reshape(batch_per_gpu, -1), axis=1)
    mask = same_person.astype(jnp.float32).reshape(batch_per_gpu)
    return jnp.sum(per * mask) / (jnp.sum(mask) + 1e-6)


def l2_loss_with_same_person(a: jax.Array, b: jax.Array,
                             same_person: jax.Array,
                             batch_per_gpu: int) -> jax.Array:
    """Σ_b( 0.5·mean_b(a−b)² · same_person_b ) / (Σ same_person + 1e-6)
    (`lib/loss.py:82-83`)."""
    d = jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32))
    per = 0.5 * jnp.mean(d.reshape(batch_per_gpu, -1), axis=1)
    mask = same_person.astype(jnp.float32).reshape(batch_per_gpu)
    return jnp.sum(per * mask) / (jnp.sum(mask) + 1e-6)


def attr_loss(a, b, batch_size: int) -> jax.Array:
    """Multi-level attribute loss (`lib/loss.py:85-91`): for feature lists
    a, b — Σ_levels Σ_b mean_b(aᵢ−bᵢ)², halved. Note the reference SUMS
    over the batch per level (`.sum()`), preserved exactly."""
    total = jnp.float32(0.0)
    for ai, bi in zip(a, b):
        d = jnp.square(ai.astype(jnp.float32) - bi.astype(jnp.float32))
        total += jnp.sum(jnp.mean(d.reshape(batch_size, -1), axis=1))
    return total / 2.0
