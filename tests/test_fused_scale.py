"""Exactness tests for the upscale+conv fusion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pggan_tpu.ops import upscale2d, equalized_conv2d, init_conv_params
from pggan_tpu.ops.fused_scale import (depth_to_space2, upscale_conv3x3,
                                       upscale_conv3x3_dilated)


def rand(*shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))


class TestUpscaleConvFusion:
    @pytest.mark.parametrize("cin,cout,res", [(8, 4, 4), (16, 16, 8), (3, 5, 6)])
    def test_exact_vs_unfused(self, cin, cout, res):
        p = init_conv_params(jax.random.PRNGKey(0), cin, cout, 3)
        p = dict(p, b=rand(cout, seed=1))      # non-zero bias
        x = rand(2, res, res, cin, seed=2)
        got = upscale_conv3x3(p, x)
        want = equalized_conv2d(p, upscale2d(x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_boundary_exact(self):
        # all-ones input exposes padding differences immediately
        p = init_conv_params(jax.random.PRNGKey(1), 2, 2, 3)
        x = jnp.ones((1, 3, 3, 2))
        got = upscale_conv3x3(p, x)
        want = equalized_conv2d(p, upscale2d(x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_gradients_match(self):
        p = init_conv_params(jax.random.PRNGKey(2), 4, 4, 3)
        x = rand(2, 4, 4, 4, seed=3)
        g_fused = jax.grad(lambda v: jnp.sum(upscale_conv3x3(p, v) ** 2))(x)
        g_plain = jax.grad(lambda v: jnp.sum(
            equalized_conv2d(p, upscale2d(v)) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_plain),
                                   rtol=1e-3, atol=1e-4)

    def test_weight_gradients_match(self):
        p = init_conv_params(jax.random.PRNGKey(3), 4, 4, 3)
        x = rand(2, 4, 4, 4, seed=4)
        gw_f = jax.grad(lambda pp: jnp.sum(upscale_conv3x3(pp, x) ** 2))(p)
        gw_p = jax.grad(lambda pp: jnp.sum(
            equalized_conv2d(pp, upscale2d(x)) ** 2))(p)
        for a, b in zip(jax.tree.leaves(gw_f), jax.tree.leaves(gw_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)

    @pytest.mark.parametrize("cin,cout,res", [(8, 4, 4), (16, 16, 8), (3, 5, 6)])
    def test_dilated_exact_vs_unfused(self, cin, cout, res):
        # the production-default formulation: one lhs-dilated conv with the
        # 4×4 tap-merged kernel (2.25× fewer MACs on TPU)
        p = init_conv_params(jax.random.PRNGKey(0), cin, cout, 3)
        p = dict(p, b=rand(cout, seed=1))
        x = rand(2, res, res, cin, seed=2)
        got = upscale_conv3x3_dilated(p, x)
        want = equalized_conv2d(p, upscale2d(x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_dilated_boundary_and_grads(self):
        p = init_conv_params(jax.random.PRNGKey(1), 4, 6, 3)
        p = dict(p, b=rand(6, seed=9))
        x = jnp.ones((1, 3, 5, 4))               # odd sizes + constant input
        np.testing.assert_allclose(
            np.asarray(upscale_conv3x3_dilated(p, x)),
            np.asarray(equalized_conv2d(p, upscale2d(x))),
            rtol=1e-4, atol=1e-5)
        xr = rand(2, 4, 4, 4, seed=3)
        g_f = jax.grad(lambda v: jnp.sum(upscale_conv3x3_dilated(p, v) ** 2))(xr)
        g_p = jax.grad(lambda v: jnp.sum(equalized_conv2d(p, upscale2d(v)) ** 2))(xr)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_p),
                                   rtol=1e-3, atol=1e-4)
        gw_f = jax.grad(lambda pp: jnp.sum(upscale_conv3x3_dilated(pp, xr) ** 2))(p)
        gw_p = jax.grad(lambda pp: jnp.sum(equalized_conv2d(pp, upscale2d(xr)) ** 2))(p)
        for a, b in zip(jax.tree.leaves(gw_f), jax.tree.leaves(gw_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)

    def test_depth_to_space_order(self):
        # group (a,b) row-major: channel block g covers subpixel (g//2, g%2)
        c = 3
        x = jnp.arange(4 * c, dtype=jnp.float32).reshape(1, 1, 1, 4 * c)
        out = depth_to_space2(x)
        assert out.shape == (1, 2, 2, c)
        np.testing.assert_array_equal(np.asarray(out[0, 0, 0]), [0, 1, 2])
        np.testing.assert_array_equal(np.asarray(out[0, 0, 1]), [3, 4, 5])
        np.testing.assert_array_equal(np.asarray(out[0, 1, 0]), [6, 7, 8])
        np.testing.assert_array_equal(np.asarray(out[0, 1, 1]), [9, 10, 11])


class TestGeneratorWithFusion:
    def test_generator_outputs_identical(self):
        from pggan_tpu.models import init_generator_params, generator_apply
        p = init_generator_params(jax.random.PRNGKey(5), latent_dim=32,
                                  depths=[16, 16, 8], scale=2)
        z = rand(4, 32, seed=6)
        fused = generator_apply(p, z, jnp.float32(0.6), fused_scale=True)
        plain = generator_apply(p, z, jnp.float32(0.6), fused_scale=False)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                                   rtol=1e-4, atol=1e-5)
        dilated = generator_apply(p, z, jnp.float32(0.6), fused_scale="dilated")
        np.testing.assert_allclose(np.asarray(dilated), np.asarray(plain),
                                   rtol=1e-4, atol=1e-5)
