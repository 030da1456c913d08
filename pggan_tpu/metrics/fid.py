"""FID (Fréchet Inception Distance) machinery.

The reference publishes no metrics and ships no FID code (README.md:22-24
is an empty stub); BASELINE.json names FID as the quality criterion, so the
metric subsystem is built here:

  * `frechet_distance` — exact Fréchet distance between Gaussians via a
    Newton–Schulz sqrtm (TPU-friendly: pure matmuls, no eigendecomposition
    on device).
  * `compute_activation_statistics` — batched feature extraction → (μ, Σ).
  * feature extractors are pluggable. `RandomConvFeatures` is the built-in
    default: a fixed-seed random convolutional projection (4 stride-2
    conv+relu stages → global mean-pool). Random-feature Fréchet distances
    are a valid, reproducible two-sample discrepancy (random projections
    preserve distributional distances); absolute values are NOT comparable
    to Inception-FID numbers. To reproduce canonical FID, pass an
    extractor wrapping InceptionV3 weights loaded from a local file — this
    environment has no network egress, so no pretrained download path is
    wired in by default.
"""

from __future__ import annotations

import functools
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Fréchet distance
# ---------------------------------------------------------------------------

def _sqrtm_newton_schulz(a: jnp.ndarray, num_iters: int = 30) -> jnp.ndarray:
    """Matrix square root via Newton–Schulz iteration (matmuls only —
    maps onto the MXU; standard trick for FID on accelerators)."""
    dim = a.shape[0]
    norm = jnp.sqrt(jnp.sum(a * a))
    y = a / norm
    z = jnp.eye(dim, dtype=a.dtype)
    eye3 = 3.0 * jnp.eye(dim, dtype=a.dtype)

    def body(_, carry):
        y, z = carry
        t = 0.5 * (eye3 - z @ y)
        return y @ t, t @ z

    y, z = jax.lax.fori_loop(0, num_iters, body, (y, z))
    return y * jnp.sqrt(norm)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """‖μ₁−μ₂‖² + Tr(Σ₁ + Σ₂ − 2·sqrtm(Σ₁Σ₂)), host-side float64.

    Tr(sqrtm(Σ₁Σ₂)) = Σ √λᵢ(Σ₁Σ₂) — eigenvalues of the (similar-to-PSD)
    product, clamped at 0. float64 + `eps·I` regularization make this
    robust to rank-deficient sample covariances; metrics run offline so
    host numpy is the right tool (the Newton–Schulz device variant below
    exists for in-graph evaluation but degrades at high condition numbers
    in f32).
    """
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    dim = mu1.shape[0]
    s1 = np.asarray(sigma1, np.float64) + np.eye(dim) * eps
    s2 = np.asarray(sigma2, np.float64) + np.eye(dim) * eps
    diff = mu1 - mu2
    eigvals = np.linalg.eigvals(s1 @ s2)
    tr_sqrt = np.sqrt(np.clip(eigvals.real, 0.0, None)).sum()
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2.0 * tr_sqrt)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def frechet_distance_device(mu1: jnp.ndarray, sigma1: jnp.ndarray,
                            mu2: jnp.ndarray, sigma2: jnp.ndarray,
                            num_iters: int = 30,
                            eps: float = 1e-3) -> jnp.ndarray:
    """On-device variant (matmul-only Newton–Schulz sqrtm — MXU-friendly,
    jit-composable). Use when FID must run inside a compiled eval loop;
    needs a larger eps for f32 conditioning."""
    diff = (mu1 - mu2).astype(jnp.float32)
    eye = jnp.eye(sigma1.shape[0], dtype=jnp.float32) * eps
    s1 = sigma1.astype(jnp.float32) + eye
    s2 = sigma2.astype(jnp.float32) + eye
    covmean = _sqrtm_newton_schulz(s1 @ s2, num_iters)
    return (jnp.sum(diff * diff) + jnp.trace(s1) + jnp.trace(s2)
            - 2.0 * jnp.trace(covmean))


# ---------------------------------------------------------------------------
# Feature extractors
# ---------------------------------------------------------------------------

class RandomConvFeatures:
    """Fixed-seed random conv feature extractor (default FID backbone).

    4 × [conv3x3 stride2 + relu] with widths (64, 128, 256, feature_dim),
    then global average pool. Weights are He-initialized from a fixed seed
    — the metric is deterministic across runs and machines.
    """

    def __init__(self, feature_dim: int = 512, seed: int = 2020,
                 input_channels: int = 3):
        widths = [64, 128, 256, feature_dim]
        rng = jax.random.PRNGKey(seed)
        self.params = []
        c_in = input_channels
        for i, c_out in enumerate(widths):
            k = jax.random.fold_in(rng, i)
            w = jax.random.normal(k, (3, 3, c_in, c_out), jnp.float32)
            w = w * np.sqrt(2.0 / (3 * 3 * c_in))
            self.params.append(w)
            c_in = c_out
        self.feature_dim = feature_dim

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """NHWC in [-1, 1] → [B, feature_dim]."""
        x = images.astype(jnp.float32)
        for w in self.params:
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(2, 2), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x)
        return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# Statistics + end-to-end FID
# ---------------------------------------------------------------------------

def compute_activations(
        batches: Iterable[np.ndarray],
        extractor: Callable[[jnp.ndarray], jnp.ndarray],
        *, max_samples: Optional[int] = None) -> np.ndarray:
    """Stream batches (NHWC in [-1,1] or uint8) → feature matrix [n, D].
    The raw features feed both FID (→ μ, Σ) and KID (→ kernel MMD), so one
    extraction pass serves every metric."""
    extract = jax.jit(lambda im: extractor(im))
    feats = []
    seen = 0
    lead = None
    for batch in batches:
        batch = np.asarray(batch)
        if batch.dtype == np.uint8:
            batch = batch.astype(np.float32) / 127.5 - 1.0
        # pad a ragged trailing batch up to the established batch shape
        # and slice its features back out: extractors are per-sample, and
        # one odd shape would cost a second remote compile per scale
        n_b = batch.shape[0]
        if lead is None:
            lead = n_b
        elif n_b < lead:
            pad = np.repeat(batch[:1], lead - n_b, axis=0)
            batch = np.concatenate([batch, pad], axis=0)
        feats.append(np.asarray(extract(jnp.asarray(batch)))[:n_b])
        seen += n_b
        if max_samples is not None and seen >= max_samples:
            break
    f = np.concatenate(feats, axis=0)
    if max_samples is not None:
        f = f[:max_samples]
    return f


def compute_activation_statistics(
        batches: Iterable[np.ndarray],
        extractor: Callable[[jnp.ndarray], jnp.ndarray],
        *, max_samples: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Stream batches (NHWC in [-1,1] or uint8) → (μ [D], Σ [D,D])."""
    f = compute_activations(batches, extractor, max_samples=max_samples)
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, sigma


def fid_between_sets(real_batches: Iterable[np.ndarray],
                     fake_batches: Iterable[np.ndarray],
                     extractor: Optional[Callable] = None,
                     *, max_samples: Optional[int] = None) -> float:
    if extractor is None:
        extractor = RandomConvFeatures()
    mu1, s1 = compute_activation_statistics(real_batches, extractor,
                                            max_samples=max_samples)
    mu2, s2 = compute_activation_statistics(fake_batches, extractor,
                                            max_samples=max_samples)
    return frechet_distance(mu1, s1, mu2, s2)
