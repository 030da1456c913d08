"""Unit tests for core ops against independent numpy golden math.

Mirrors the reference's (latent) ref-vs-kernel dual-impl test pattern
(`bias_act.py:83-86`) — here numpy is the golden and jnp/pallas are under
test.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pggan_tpu.ops import (
    pixel_norm, upscale2d, downscale2d, minibatch_stddev, bias_act,
    equalized_conv2d, equalized_linear, init_conv_params, init_linear_params,
    he_constant, upfirdn2d, setup_filter,
)
from pggan_tpu.ops.basic import leaky_relu, blend


def rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


class TestPixelNorm:
    def test_matches_golden(self):
        x = rand(2, 4, 4, 8)
        got = np.asarray(pixel_norm(jnp.asarray(x)))
        want = x / np.sqrt((x ** 2).mean(axis=-1, keepdims=True) + 1e-8)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_2d_latent(self):
        x = rand(3, 512, seed=1)
        got = np.asarray(pixel_norm(jnp.asarray(x)))
        want = x / np.sqrt((x ** 2).mean(axis=-1, keepdims=True) + 1e-8)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_second_order_differentiable(self):
        x = jnp.asarray(rand(2, 8))
        f = lambda v: jnp.sum(pixel_norm(v) ** 2)
        g = jax.grad(lambda v: jnp.sum(jax.grad(f)(v) ** 2))(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestResample:
    def test_upscale_nearest(self):
        x = rand(1, 2, 2, 3)
        got = np.asarray(upscale2d(jnp.asarray(x)))
        assert got.shape == (1, 4, 4, 3)
        # nearest repeat (lib/utils.py:106-118)
        np.testing.assert_array_equal(got[0, 0, 0], x[0, 0, 0])
        np.testing.assert_array_equal(got[0, 1, 1], x[0, 0, 0])
        np.testing.assert_array_equal(got[0, 3, 2], x[0, 1, 1])

    def test_downscale_avg(self):
        x = rand(1, 4, 4, 2)
        got = np.asarray(downscale2d(jnp.asarray(x)))
        want = x.reshape(1, 2, 2, 2, 2, 2).mean(axis=(2, 4))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_down_then_up_is_fade_path(self):
        x = rand(2, 8, 8, 3)
        low = upscale2d(downscale2d(jnp.asarray(x)))
        assert low.shape == x.shape

    def test_upscale_factor1_identity(self):
        x = jnp.asarray(rand(1, 4, 4, 2))
        assert upscale2d(x, 1) is x
        assert downscale2d(x, 1) is x


class TestMinibatchStddev:
    def golden(self, x, subgroup_size=4):
        n, h, w, c = x.shape
        sg = min(n, subgroup_size)
        if n % sg != 0:
            sg = n
        if sg <= 1:
            y = np.zeros((n, h, w, 1), np.float32)
            return np.concatenate([x, y], axis=-1)
        g = n // sg
        y = x.reshape(g, sg, h, w, c)
        var = y.var(axis=1, ddof=1)               # torch.var is unbiased
        std = np.sqrt(var + 1e-8)
        stat = std.mean(axis=(1, 2, 3))
        y = np.repeat(stat, sg)[:, None, None, None] * np.ones((n, h, w, 1), np.float32)
        return np.concatenate([x, y], axis=-1)

    @pytest.mark.parametrize("batch", [1, 2, 4, 6, 8])
    def test_matches_golden(self, batch):
        x = rand(batch, 4, 4, 8, seed=batch)
        got = np.asarray(minibatch_stddev(jnp.asarray(x)))
        np.testing.assert_allclose(got, self.golden(x), rtol=1e-5, atol=1e-6)

    def test_channel_count(self):
        x = jnp.asarray(rand(4, 4, 4, 16))
        assert minibatch_stddev(x).shape == (4, 4, 4, 17)

    def test_second_order_differentiable(self):
        x = jnp.asarray(rand(4, 2, 2, 3))
        f = lambda v: jnp.sum(minibatch_stddev(v) ** 2)
        g = jax.grad(lambda v: jnp.sum(jax.grad(f)(v) ** 2))(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestEqualized:
    def test_he_constant(self):
        assert he_constant(512) == pytest.approx(np.sqrt(2.0 / 512))
        assert he_constant(3 * 3 * 64) == pytest.approx(np.sqrt(2.0 / 576))

    def test_conv_scale_applied_at_runtime(self):
        rng = jax.random.PRNGKey(0)
        p = init_conv_params(rng, 8, 16, 3)
        # weights ~ N(0,1) at init (lib/layers.py:56-57)
        w = np.asarray(p["w"])
        assert abs(w.std() - 1.0) < 0.1
        assert np.all(np.asarray(p["b"]) == 0)
        assert float(p["scale"]) == pytest.approx(np.sqrt(2.0 / (8 * 9)))

    def test_conv_golden(self):
        rng = jax.random.PRNGKey(1)
        p = init_conv_params(rng, 3, 4, 1)
        x = rand(2, 5, 5, 3, seed=2)
        got = np.asarray(equalized_conv2d(p, jnp.asarray(x)))
        w = np.asarray(p["w"])[0, 0]              # [in, out] for 1x1
        scale = float(p["scale"])
        want = (x @ w) * scale                    # bias is 0
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_linear_golden(self):
        rng = jax.random.PRNGKey(2)
        p = init_linear_params(rng, 16, 8)
        x = rand(3, 16, seed=3)
        got = np.asarray(equalized_linear(p, jnp.asarray(x)))
        want = (x @ np.asarray(p["w"])) * float(p["scale"])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_scale_multiplies_bias_too(self):
        # Reference applies the constant to conv OUTPUT including bias
        # (lib/layers.py:58-62).
        rng = jax.random.PRNGKey(3)
        p = init_linear_params(rng, 4, 2)
        p = dict(p, b=jnp.ones_like(p["b"]))
        x = jnp.zeros((1, 4))
        got = np.asarray(equalized_linear(p, x))
        np.testing.assert_allclose(got, float(p["scale"]) * np.ones((1, 2)), rtol=1e-6)


class TestBiasAct:
    def test_lrelu_gain(self):
        x = rand(2, 8)
        b = rand(8, seed=9)
        got = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), act="lrelu"))
        y = x + b
        want = np.where(y >= 0, y, 0.2 * y) * np.sqrt(2.0)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_clamp(self):
        x = jnp.asarray([[10.0, -10.0]])
        got = np.asarray(bias_act(x, act="linear", clamp=1.0))
        np.testing.assert_array_equal(got, [[1.0, -1.0]])

    @pytest.mark.parametrize("act", ["linear", "relu", "lrelu", "tanh",
                                     "sigmoid", "elu", "selu", "softplus", "swish"])
    def test_all_activations_run(self, act):
        x = jnp.asarray(rand(2, 4))
        out = bias_act(x, act=act)
        assert out.shape == x.shape


class TestUpfirdn2d:
    def test_identity(self):
        x = jnp.asarray(rand(1, 4, 4, 2))
        got = upfirdn2d(x, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=1e-6)

    def test_box_downsample_matches_downscale(self):
        x = jnp.asarray(rand(1, 8, 8, 3))
        f = setup_filter([1, 1])
        got = np.asarray(upfirdn2d(x, f, down=2))
        want = np.asarray(downscale2d(x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_zero_insert_upsample(self):
        # reference semantics: n·up output incl. trailing zeros
        # (upfirdn2d.py:184-187)
        x = jnp.asarray(rand(1, 2, 2, 1))
        got = np.asarray(upfirdn2d(x, jnp.ones((1, 1)), up=2))
        assert got.shape == (1, 4, 4, 1)
        np.testing.assert_allclose(got[0, 0, 0, 0], np.asarray(x)[0, 0, 0, 0], rtol=1e-6)
        np.testing.assert_allclose(got[0, 0, 1, 0], 0.0, atol=1e-7)
        np.testing.assert_allclose(got[0, 3, 3, 0], 0.0, atol=1e-7)  # trailing

    def test_upsample_box_filter_matches_nearest(self):
        # up=2 with a [1,1] box filter ≡ nearest-neighbor upscale
        x = jnp.asarray(rand(1, 4, 4, 3, seed=6))
        f = jnp.ones((2, 2), jnp.float32)
        got = np.asarray(upfirdn2d(x, f, up=2, padding=(1, 0, 1, 0)))
        want = np.asarray(upscale2d(x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_differentiable(self):
        x = jnp.asarray(rand(1, 4, 4, 2))
        f = setup_filter([1, 2, 1])
        g = jax.grad(lambda v: jnp.sum(upfirdn2d(v, f, up=2) ** 2))(x)
        assert g.shape == x.shape


class TestLreluImpls:
    def test_abs_probe_form_matches_where(self, monkeypatch):
        """The PGGAN_LRELU_IMPL=abs probe (a·x + b·|x|) is value- and
        grad-exact vs the where form away from 0 (at 0 both give 0; the
        subgradient differs only on a measure-zero set)."""
        from pggan_tpu.ops import basic
        x = jnp.asarray(rand(4, 8) * 2.0 - 1.0)
        want = np.asarray(leaky_relu(x, 0.2))
        gwant = np.asarray(jax.grad(lambda v: jnp.sum(leaky_relu(v, 0.2)))(x))
        monkeypatch.setattr(basic, "_LRELU_IMPL", "abs")
        got = np.asarray(basic.leaky_relu(x, 0.2))
        ggot = np.asarray(jax.grad(
            lambda v: jnp.sum(basic.leaky_relu(v, 0.2)))(x))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(ggot, gwant, rtol=1e-6, atol=1e-7)


class TestFilter2d:
    @staticmethod
    def np_filter2d(x, f):
        """Direct numpy port of the vendored filter2d (`upfirdn2d.py:277-311`
        with `_upfirdn2d_ref`): resolution-preserving CONVOLUTION with the
        leading pad taking the larger half (fw//2) — the split that
        matters for even-tap filters."""
        fh = fw = len(f)
        f2 = np.outer(f, f).astype(np.float32)[::-1, ::-1]   # conv = flipped
        py0, py1 = fh // 2, (fh - 1) // 2
        px0, px1 = fw // 2, (fw - 1) // 2
        xp = np.pad(x, ((0, 0), (py0, py1), (px0, px1), (0, 0)))
        n, h, w, c = x.shape
        out = np.zeros_like(x, dtype=np.float32)
        for i in range(h):
            for j in range(w):
                out[:, i, j, :] = np.einsum(
                    "bhwc,hw->bc", xp[:, i:i + fh, j:j + fw, :], f2)
        return out

    @pytest.mark.parametrize("taps", [[1.0, 3.0, 3.0, 1.0],   # even (4-tap)
                                      [1.0, 2.0, 1.0]])        # odd
    def test_matches_reference_padding_split(self, taps):
        from pggan_tpu.ops.resample import filter2d
        f = np.asarray(taps, np.float32)
        f = f / f.sum()
        x = rand(2, 6, 6, 3, seed=21)
        got = np.asarray(filter2d(jnp.asarray(x), jnp.asarray(f)))
        np.testing.assert_allclose(got, self.np_filter2d(x, f),
                                   rtol=1e-5, atol=1e-6)


class TestBlend:
    def test_formula(self):
        a, b = jnp.ones((2, 2)), jnp.zeros((2, 2))
        np.testing.assert_allclose(np.asarray(blend(a, b, 0.25)), 0.75)

    def test_alpha_zero_is_old(self):
        a, b = jnp.asarray(rand(2, 2)), jnp.asarray(rand(2, 2, seed=5))
        np.testing.assert_allclose(np.asarray(blend(a, b, 0.0)), np.asarray(a))

    def test_bf16_activations_keep_f32_fade_resolution(self):
        """Weights compute in f32: bf16(1 − 1/600) == 1.0, so a bf16-cast
        alpha would make the first fade jumps exact no-ops and let the
        weights sum past 1."""
        a = jnp.ones((4, 4), jnp.bfloat16)
        b = -jnp.ones((4, 4), jnp.bfloat16)
        small = 1.0 / 600.0
        out0 = np.asarray(blend(a, b, jnp.float32(0.0)), np.float32)
        out1 = np.asarray(blend(a, b, jnp.float32(small)), np.float32)
        assert blend(a, b, 0.0).dtype == jnp.bfloat16   # output stays bf16
        # alpha=1/600 moves the blend: (1-2a) = 0.99667 → bf16 0.99609
        assert out1[0, 0] < out0[0, 0]
        expected = np.float32(np.asarray(
            jnp.asarray(1.0 - 2 * small, jnp.bfloat16)))
        np.testing.assert_allclose(out1[0, 0], expected, rtol=1e-6)
