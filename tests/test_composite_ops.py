"""Tests for the composite resampling ops (filtered_lrelu, conv2d_resample,
grid_sample)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pggan_tpu.ops import (filtered_lrelu, conv2d_resample, grid_sample,
                           setup_filter, bias_act, upscale2d, downscale2d)


def rand(*shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))


class TestFilteredLrelu:
    def test_identity_path_matches_bias_act(self):
        # up=down=1, no filters → exactly bias_act lrelu
        x = rand(2, 8, 8, 4)
        b = rand(4, seed=1)
        got = filtered_lrelu(x, b=b)
        want = bias_act(x, b, act="lrelu")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_up2_raw_padding_shape(self):
        # reference raw-padding semantics: out = in·up + px0 + px1 − fw + 1
        # = 16 + 0 + 0 − 4 + 1 = 13 for an 8-in, 4-tap, pad-0 up stage
        x = rand(1, 8, 8, 2)
        f = setup_filter([1, 3, 3, 1])
        out = filtered_lrelu(x, fu=f, up=2)
        assert out.shape == (1, 13, 13, 2)
        # padding restores shape preservation: px0+px1 = fw − 1 = 3
        out = filtered_lrelu(x, fu=f, up=2, padding=(2, 1, 2, 1))
        assert out.shape == (1, 16, 16, 2)

    def test_bias_applied_before_upsample(self):
        # a constant bias through the (normalized) up-filter stays constant
        # only if added BEFORE zero-insertion; compare against explicit
        # composition
        from pggan_tpu.ops import upfirdn2d
        x = rand(1, 6, 6, 3, seed=11)
        b = rand(3, seed=12)
        f = setup_filter([1, 2, 1])
        got = filtered_lrelu(x, fu=f, b=b, up=2, gain=1.0)
        xb = x + b.reshape(1, 1, 1, 3)
        want = upfirdn2d(xb, f, up=2, gain=4.0)
        want = jnp.where(want >= 0, want, want * 0.2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_up2_down2_roundtrip_shape(self):
        x = rand(1, 8, 8, 2)
        f = setup_filter([1, 3, 3, 1])
        # up: 16+3+3-4+1 = 19; down: (19-4)//2 + 1 = 8
        out = filtered_lrelu(x, fu=f, fd=f, up=2, down=2, padding=3)
        assert out.shape == (1, 8, 8, 2)

    def test_clamp(self):
        x = jnp.full((1, 4, 4, 1), 100.0)
        out = filtered_lrelu(x, clamp=1.0)
        assert float(jnp.max(out)) <= 1.0

    def test_second_order_differentiable(self):
        x = rand(1, 4, 4, 2)
        f = setup_filter([1, 1])
        fn = lambda v: jnp.sum(filtered_lrelu(v, fu=f, up=2) ** 2)
        g = jax.grad(lambda v: jnp.sum(jax.grad(fn)(v) ** 2))(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestConv2dResample:
    def test_plain_conv(self):
        x = rand(1, 8, 8, 3)
        w = rand(3, 3, 3, 4, seed=2)
        got = conv2d_resample(x, w, padding=1)
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_down2_strided(self):
        x = rand(1, 8, 8, 3)
        w = rand(2, 2, 3, 4, seed=3)
        out = conv2d_resample(x, w, down=2)
        assert out.shape == (1, 4, 4, 4)

    def test_up2(self):
        x = rand(1, 4, 4, 3)
        w = rand(1, 1, 3, 2, seed=4)
        out = conv2d_resample(x, w, up=2)
        assert out.shape == (1, 8, 8, 2)

    def test_flip_weight_semantics(self):
        """Independent numpy oracle (not self-consistency — a globally
        inverted flip_weight satisfies corr(x, flip(w)) == conv(x, w)):
        flip_weight=True is CORRELATION (`conv2d_resample.py:54`,
        the torch-conv2d fast path), False is convolution."""
        x = rand(1, 5, 5, 1, seed=5)
        w = rand(3, 3, 1, 1, seed=6)
        corr = np.asarray(conv2d_resample(x, w, padding=1, flip_weight=True))
        conv = np.asarray(conv2d_resample(x, w, padding=1, flip_weight=False))

        xp = np.pad(np.asarray(x)[0, :, :, 0], 1)
        k = np.asarray(w)[:, :, 0, 0]
        want_corr = np.zeros((5, 5))
        want_conv = np.zeros((5, 5))
        for i in range(5):
            for j in range(5):
                win = xp[i:i + 3, j:j + 3]
                want_corr[i, j] = (win * k).sum()
                want_conv[i, j] = (win * k[::-1, ::-1]).sum()
        np.testing.assert_allclose(corr[0, :, :, 0], want_corr,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(conv[0, :, :, 0], want_conv,
                                   rtol=1e-5, atol=1e-5)


class TestGridSample:
    def test_identity_grid(self):
        x = rand(1, 8, 8, 2, seed=7)
        ys, xs = jnp.meshgrid(jnp.linspace(-1 + 1 / 8, 1 - 1 / 8, 8),
                              jnp.linspace(-1 + 1 / 8, 1 - 1 / 8, 8),
                              indexing="ij")
        grid = jnp.stack([xs, ys], axis=-1)[None]
        out = grid_sample(x, grid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=1e-4, atol=1e-4)

    def test_shift_sampling(self):
        # constant-gradient image: shifting by one pixel shifts values
        base = jnp.arange(8, dtype=jnp.float32)
        x = jnp.broadcast_to(base[None, None, :, None], (1, 8, 8, 1))
        ys, xs = jnp.meshgrid(jnp.linspace(-1 + 1 / 8, 1 - 1 / 8, 8),
                              jnp.linspace(-1 + 1 / 8, 1 - 1 / 8, 8),
                              indexing="ij")
        grid = jnp.stack([xs + 2.0 / 8, ys], axis=-1)[None]   # +1 px in x
        out = grid_sample(x, grid)
        np.testing.assert_allclose(np.asarray(out[0, 0, :6, 0]),
                                   np.asarray(base[1:7]), rtol=1e-4, atol=1e-4)

    def test_grad_of_grad(self):
        x = rand(1, 4, 4, 1, seed=8)
        grid = jnp.zeros((1, 3, 3, 2))
        fn = lambda g: jnp.sum(grid_sample(x, g) ** 2)
        gg = jax.grad(lambda g: jnp.sum(jax.grad(fn)(g) ** 2))(grid)
        assert np.all(np.isfinite(np.asarray(gg)))
