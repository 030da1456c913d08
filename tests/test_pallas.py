"""Pallas-kernel vs jnp-reference parity (interpret mode on CPU).

Mirrors the reference's impl='cuda' vs impl='ref' dual-path testing pattern
(`bias_act.py:83-86`). On CPU the kernels run through the Pallas
interpreter; on TPU they compile to Mosaic — same code path selection as
production `impl='pallas'`.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

from pggan_tpu.ops import basic
from pggan_tpu.ops import pallas_kernels as pk

# CPU runs require interpret mode for pallas_call
_interp = functools.partial(pl.pallas_call)


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    if jax.default_backend() != "tpu":
        monkeypatch.setattr(
            pl, "pallas_call",
            functools.partial(_interp, interpret=True))


def rand(*shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))


class TestPixelNormPallas:
    @pytest.mark.parametrize("shape", [(4, 8, 8, 32), (16, 512), (2, 4, 4, 513)])
    def test_matches_ref(self, shape):
        x = rand(*shape)
        got = pk.pixel_norm(x, 1e-8)
        want = basic.pixel_norm(x, 1e-8, impl="xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_ragged_rows(self):
        # M = 2*3*3 = 18, not a multiple of the block row count
        x = rand(2, 3, 3, 16, seed=3)
        got = pk.pixel_norm(x, 1e-8)
        want = basic.pixel_norm(x, 1e-8, impl="xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_grad_matches_ref(self):
        x = rand(4, 16, seed=1)
        g_pal = jax.grad(lambda v: jnp.sum(pk.pixel_norm(v, 1e-8) ** 2))(x)
        g_ref = jax.grad(lambda v: jnp.sum(basic.pixel_norm(v, impl="xla") ** 2))(x)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-6)

    def test_second_order(self):
        x = rand(4, 16, seed=2)
        f = lambda v: jnp.sum(pk.pixel_norm(v, 1e-8) ** 2)
        gg = jax.grad(lambda v: jnp.sum(jax.grad(f)(v) ** 2))(x)
        assert np.all(np.isfinite(np.asarray(gg)))


class TestBiasLreluPallas:
    def test_matches_ref(self):
        x = rand(4, 8, 8, 64)
        b = rand(64, seed=5)
        got = pk.bias_lrelu_gain(x, b)
        want = basic.bias_act(x, b, act="lrelu", impl="xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_none_bias(self):
        x = rand(8, 32, seed=6)
        got = pk.bias_lrelu_gain(x, None)
        want = basic.bias_act(x, None, act="lrelu", impl="xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_grads_both_args(self):
        x, b = rand(8, 32, seed=7), rand(32, seed=8)
        def loss_pal(x, b):
            return jnp.sum(pk.bias_lrelu_gain(x, b) ** 2)
        def loss_ref(x, b):
            return jnp.sum(basic.bias_act(x, b, act="lrelu", impl="xla") ** 2)
        gx_p, gb_p = jax.grad(loss_pal, argnums=(0, 1))(x, b)
        gx_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(x, b)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r), rtol=1e-4)


class TestLreluPixelNormPallas:
    @pytest.mark.parametrize("shape", [(4, 8, 8, 32), (16, 512), (2, 4, 4, 96)])
    def test_matches_ref(self, shape):
        x = rand(*shape, seed=13)
        got = pk.lrelu_pixel_norm(x, 0.2, 1e-8)
        want = basic.lrelu_pixel_norm(x, 0.2, 1e-8, impl="xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_fused_vjp_matches_ref(self):
        # the backward is its own fused kernel (custom_vjp; this op is
        # generator-only so first-order suffices — see pallas_kernels.py)
        x = rand(4, 6, 6, 24, seed=14)
        g_pal = jax.grad(lambda v: jnp.sum(pk.lrelu_pixel_norm(v, 0.2, 1e-8)
                                           * jnp.cos(v)))(x)
        g_ref = jax.grad(lambda v: jnp.sum(
            basic.lrelu_pixel_norm(v, 0.2, 1e-8, impl="xla") * jnp.cos(v)))(x)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-6)


class TestMinibatchStddevPallas:
    @pytest.mark.parametrize("batch", [4, 8, 6])
    def test_stat_matches_ref(self, batch):
        x = rand(batch, 4, 4, 16, seed=batch)
        full_ref = basic.minibatch_stddev(x, impl="xla")
        full_pal = basic.minibatch_stddev(x, impl="pallas")
        np.testing.assert_allclose(np.asarray(full_pal), np.asarray(full_ref),
                                   rtol=1e-4, atol=1e-6)

    def test_grad_through_stat(self):
        x = rand(4, 2, 2, 8, seed=9)
        g_p = jax.grad(lambda v: jnp.sum(basic.minibatch_stddev(v, impl="pallas") ** 2))(x)
        g_r = jax.grad(lambda v: jnp.sum(basic.minibatch_stddev(v, impl="xla") ** 2))(x)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                                   rtol=1e-4, atol=1e-6)


class TestModelWithPallasImpl:
    def test_generator_runs_with_pallas(self):
        from pggan_tpu.models import init_generator_params, generator_apply
        p = init_generator_params(jax.random.PRNGKey(0), latent_dim=32,
                                  depths=[16, 16], scale=1)
        z = rand(4, 32, seed=11)
        out_p = generator_apply(p, z, jnp.float32(0.5), impl="pallas")
        out_r = generator_apply(p, z, jnp.float32(0.5), impl="xla")
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                                   rtol=1e-4, atol=1e-5)

    def test_discriminator_r1_with_pallas(self):
        # grad-of-grad through pallas-impl D (custom_jvp second order)
        from pggan_tpu.models import init_discriminator_params, discriminator_apply
        p = init_discriminator_params(jax.random.PRNGKey(1), depths=[16, 16], scale=0)
        x = rand(4, 4, 4, 3, seed=12)

        def loss(params):
            g = jax.grad(lambda im: jnp.sum(
                discriminator_apply(params, im, 0.0, impl="pallas")))(x)
            return jnp.sum(g ** 2)

        grads = jax.grad(loss)(p)
        for leaf in jax.tree.leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf)))
