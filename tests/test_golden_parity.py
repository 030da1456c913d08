"""Full-network golden parity: pure-numpy reimplementation of the PGGAN
forward math (conv via explicit im2col, exact reference semantics) checked
against the JAX networks with the SAME weights.

This is the per-scale numerical-parity evidence the BASELINE north star
asks for, without importing any reference code: the numpy golden is an
independent second implementation of the documented math
(`pggan/nets.py`, `lib/blocks.py`, `lib/layers.py`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pggan_tpu.models import (
    init_generator_params, init_discriminator_params,
    generator_apply, discriminator_apply,
)

DEPTHS = [16, 16, 8]
LATENT = 32


# ---------------------------------------------------------------------------
# numpy golden ops (NHWC)
# ---------------------------------------------------------------------------

def np_conv2d(x, w, b, scale):
    """SAME conv, stride 1: x [B,H,W,Cin], w [kh,kw,Cin,Cout]."""
    kh, kw, cin, cout = w.shape
    b_, h, w_sz, _ = x.shape
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    out = np.zeros((b_, h, w_sz, cout), np.float32)
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, i:i + h, j:j + w_sz, :]          # [B,H,W,Cin]
            out += patch @ w[i, j]                          # [B,H,W,Cout]
    return (out + b) * scale


def np_linear(x, w, b, scale):
    return (x @ w + b) * scale


def np_lrelu(x, slope=0.2):
    return np.where(x >= 0, x, x * slope)


def np_pixel_norm(x, eps=1e-8):
    return x / np.sqrt((x ** 2).mean(axis=-1, keepdims=True) + eps)


def np_upscale2d(x):
    return x.repeat(2, axis=1).repeat(2, axis=2)


def np_downscale2d(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def np_minibatch_stddev(x, subgroup=4, eps=1e-8):
    n, h, w, c = x.shape
    sg = min(n, subgroup)
    if n % sg:
        sg = n
    if sg <= 1:
        y = np.zeros((n, h, w, 1), np.float32)
        return np.concatenate([x, y], axis=-1)
    g = n // sg
    v = x.reshape(g, sg, h, w, c).var(axis=1, ddof=1)
    stat = np.sqrt(v + eps).mean(axis=(1, 2, 3))
    y = np.repeat(stat, sg)[:, None, None, None] * np.ones((n, h, w, 1), np.float32)
    return np.concatenate([x, y], axis=-1)


def P(p):
    return {k: np.asarray(v, np.float32) for k, v in p.items()}


def np_generator(params, z, alpha, scale):
    """Reference G forward (pggan/nets.py:121-159) in numpy."""
    z = np_pixel_norm(np.asarray(z, np.float32))
    f = P(params["format"])
    x = np_lrelu(np_linear(z, f["w"], f["b"], f["scale"]))
    d0 = params["first_conv"]["w"].shape[2]
    x = x.reshape(-1, d0, 4, 4).transpose(0, 2, 3, 1)     # torch NCHW-major
    x = np_pixel_norm(x)
    fc = P(params["first_conv"])
    x = np_pixel_norm(np_lrelu(np_conv2d(x, fc["w"], fc["b"], fc["scale"])))
    penult = x
    for i in range(scale):
        penult = x
        blk = params["blocks"][i]
        x = np_upscale2d(x)
        c0, c1 = P(blk["conv0"]), P(blk["conv1"])
        x = np_pixel_norm(np_lrelu(np_conv2d(x, c0["w"], c0["b"], c0["scale"])))
        x = np_pixel_norm(np_lrelu(np_conv2d(x, c1["w"], c1["b"], c1["scale"])))
    tr = P(params["torgb"][-1])
    out = np_conv2d(x, tr["w"], tr["b"], tr["scale"])
    if scale >= 1:
        tr2 = P(params["torgb"][-2])
        up = np_upscale2d(np_conv2d(penult, tr2["w"], tr2["b"], tr2["scale"]))
        out = (1 - alpha) * up + alpha * out
    return out


def np_discriminator(params, x, alpha, scale):
    """Reference D forward (pggan/nets.py:248-277) in numpy."""
    x = np.asarray(x, np.float32)
    x_down = None
    if scale >= 1:
        fr2 = P(params["fromrgb"][-2])
        x_down = np_lrelu(np_conv2d(np_downscale2d(x), fr2["w"], fr2["b"], fr2["scale"]))
    fr = P(params["fromrgb"][-1])
    y = np_lrelu(np_conv2d(x, fr["w"], fr["b"], fr["scale"]))
    for pos, i in enumerate(reversed(range(scale))):
        blk = params["blocks"][i]
        c0, c1 = P(blk["conv0"]), P(blk["conv1"])
        y = np_lrelu(np_conv2d(y, c0["w"], c0["b"], c0["scale"]))
        y = np_lrelu(np_conv2d(y, c1["w"], c1["b"], c1["scale"]))
        y = np_downscale2d(y)
        if pos == 0:
            y = (1 - alpha) * x_down + alpha * y
    y = np_minibatch_stddev(y)
    lc = P(params["last_conv"])
    y = np_lrelu(np_conv2d(y, lc["w"], lc["b"], lc["scale"]))
    y = y.transpose(0, 3, 1, 2).reshape(y.shape[0], -1)   # torch flatten order
    ll = P(params["last_linear"])
    y = np_lrelu(np_linear(y, ll["w"], ll["b"], ll["scale"]))
    dec = P(params["decision"])
    return np_linear(y, dec["w"], dec["b"], dec["scale"])


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------

class TestGeneratorGolden:
    @pytest.mark.parametrize("scale,alpha", [(0, 1.0), (1, 0.0), (1, 0.37),
                                             (2, 0.5), (2, 1.0)])
    def test_forward_parity(self, scale, alpha):
        params = init_generator_params(
            jax.random.PRNGKey(3), latent_dim=LATENT, depths=DEPTHS, scale=scale)
        z = np.random.RandomState(scale).randn(4, LATENT).astype(np.float32)
        got = np.asarray(generator_apply(params, jnp.asarray(z), jnp.float32(alpha)))
        want = np_generator(params, z, alpha, scale)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


class TestDiscriminatorGolden:
    @pytest.mark.parametrize("scale,alpha", [(0, 1.0), (1, 0.0), (1, 0.37),
                                             (2, 0.5), (2, 1.0)])
    def test_forward_parity(self, scale, alpha):
        params = init_discriminator_params(
            jax.random.PRNGKey(4), depths=DEPTHS, scale=scale)
        res = 2 ** (scale + 2)
        x = np.random.RandomState(scale + 9).randn(8, res, res, 3).astype(np.float32)
        got = np.asarray(discriminator_apply(params, jnp.asarray(x), jnp.float32(alpha)))
        want = np_discriminator(params, x, alpha, scale)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


class TestEndToEndGolden:
    def test_g_then_d(self):
        scale, alpha = 1, 0.6
        pg = init_generator_params(
            jax.random.PRNGKey(5), latent_dim=LATENT, depths=DEPTHS, scale=scale)
        pd = init_discriminator_params(
            jax.random.PRNGKey(6), depths=DEPTHS, scale=scale)
        z = np.random.RandomState(0).randn(4, LATENT).astype(np.float32)
        img_jax = generator_apply(pg, jnp.asarray(z), jnp.float32(alpha))
        logits_jax = np.asarray(discriminator_apply(pd, img_jax, jnp.float32(alpha)))
        img_np = np_generator(pg, z, alpha, scale)
        logits_np = np_discriminator(pd, img_np, alpha, scale)
        np.testing.assert_allclose(logits_jax, logits_np, rtol=5e-4, atol=5e-5)
