"""Space-to-depth packed execution (ops/packed.py): exactness against the
unpacked ops it replaces, to second differentiation order, plus the
discriminator/train-step integration. This is the 1024² layout-copy fix —
the packed path must be a pure representation change, never a semantic
one (BASELINE.md: 41% of the 1024² step was XLA layout copies around
huge-spatial × tiny-channel grad-of-grad convs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pggan_tpu.ops.basic import downscale2d, pixel_norm, upscale2d
from pggan_tpu.ops.equalized import equalized_conv2d, init_conv_params
from pggan_tpu.ops.fused_scale import depth_to_space2
from pggan_tpu.ops.packed import (
    downscale2d_packed,
    packed_equalized_conv2d,
    pixel_norm_packed,
    space_to_depth2,
    upscale2d_packed,
)


def _x(b=2, r=8, c=5, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(b, r, r, c), jnp.float32)


class TestPackedPrimitives:
    def test_space_depth_round_trip(self):
        x = _x()
        np.testing.assert_array_equal(
            np.asarray(depth_to_space2(space_to_depth2(x))), np.asarray(x))

    def test_host_unpack_matches_depth_to_space(self):
        # utils/image.unpack_space_to_depth is the numpy inverse eval/
        # serving paths (FID sampler, demo.py) apply to packed G outputs —
        # it must equal the device-side depth_to_space2 exactly
        from pggan_tpu.utils.image import unpack_space_to_depth
        x = _x(3, 6, 7)
        p = space_to_depth2(x)
        np.testing.assert_array_equal(
            unpack_space_to_depth(np.asarray(p)),
            np.asarray(depth_to_space2(p)))

    def test_group_order_matches_fused_scale_convention(self):
        # subpixel (a, b) must live in group 2a+b (the depth_to_space2
        # convention) — a transposed convention would silently scramble
        # pixels yet pass every permutation-invariant test
        x = _x(1, 4, 1)
        p = space_to_depth2(x)
        for a in (0, 1):
            for b in (0, 1):
                g = 2 * a + b
                np.testing.assert_array_equal(
                    np.asarray(p[0, :, :, g]), np.asarray(x[0, a::2, b::2, 0]))

    @pytest.mark.parametrize("kernel", [3, 1])
    def test_packed_conv_matches_unpacked(self, kernel):
        p = init_conv_params(jax.random.PRNGKey(1), 5, 7, kernel,
                             init_bias_to_zero=False)
        x = _x()
        want = equalized_conv2d(p, x)
        got = depth_to_space2(packed_equalized_conv2d(p, space_to_depth2(x)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_packed_conv3x3_boundary_rows(self):
        # padding equivalence is the subtle part of the kernel transform:
        # check the outermost output rows/cols explicitly
        p = init_conv_params(jax.random.PRNGKey(2), 2, 3, 3,
                             init_bias_to_zero=False)
        x = _x(1, 6, 2, seed=3)
        want = np.asarray(equalized_conv2d(p, x))
        got = np.asarray(depth_to_space2(
            packed_equalized_conv2d(p, space_to_depth2(x))))
        np.testing.assert_allclose(got[:, 0], want[:, 0], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got[:, -1], want[:, -1], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got[:, :, 0], want[:, :, 0], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got[:, :, -1], want[:, :, -1], rtol=1e-5, atol=1e-5)

    def test_downscale_packed_matches(self):
        x = _x()
        np.testing.assert_allclose(
            np.asarray(downscale2d_packed(space_to_depth2(x))),
            np.asarray(downscale2d(x, 2)), rtol=1e-6, atol=1e-6)

    def test_upscale_packed_matches(self):
        x = _x(2, 4, 3)
        np.testing.assert_array_equal(
            np.asarray(upscale2d_packed(x)),
            np.asarray(space_to_depth2(upscale2d(x, 2))))

    def test_pixel_norm_packed_matches(self):
        x = _x()
        np.testing.assert_allclose(
            np.asarray(pixel_norm_packed(space_to_depth2(x))),
            np.asarray(space_to_depth2(pixel_norm(x))), rtol=1e-5, atol=1e-6)

    def test_packed_conv_second_order_grads_match(self):
        # the R1 grad-of-grad must flow identically through the packed
        # form: compare ∇θ ‖∇x f‖² for f = sum(conv(x)) between paths
        p = init_conv_params(jax.random.PRNGKey(4), 3, 4, 3,
                             init_bias_to_zero=False)
        x = _x(2, 8, 3, seed=5)

        def r1_like(params, conv):
            def f(im):
                return jnp.sum(conv(params, im))
            g = jax.grad(f)(x)
            return jnp.sum(g * g)

        unpacked = lambda q, im: equalized_conv2d(q, im)
        packed = lambda q, im: depth_to_space2(
            packed_equalized_conv2d(q, space_to_depth2(im)))
        want = jax.grad(r1_like)(p, unpacked)
        got = jax.grad(r1_like)(p, packed)
        for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestDiscriminatorPacked:
    def _setup(self, scale=2):
        from pggan_tpu.models import init_discriminator_params
        depths = [16, 16, 8]
        p = init_discriminator_params(jax.random.PRNGKey(0), depths=depths,
                                      scale=scale)
        x = _x(8, 4 * 2 ** scale, 3, seed=7)
        return p, x

    @pytest.mark.parametrize("levels", [1, 2])
    def test_logits_match_unpacked(self, levels):
        from pggan_tpu.models import discriminator_apply
        p, x = self._setup()
        for alpha in (0.0, 0.4, 1.0):
            a = jnp.float32(alpha)
            want = discriminator_apply(p, x, a)
            got = discriminator_apply(p, x, a, hires_pack=levels)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-4)

    def test_image_grads_match_unpacked(self):
        # the R1 inner gradient is wrt the IMAGE through the packed level:
        # pack/unpack transposes must be gradient-transparent
        from pggan_tpu.models import discriminator_apply
        p, x = self._setup()
        a = jnp.float32(0.5)

        def f(im, **kw):
            return jnp.sum(discriminator_apply(p, im, a, **kw))

        want = jax.grad(f)(x)
        got = jax.grad(lambda im: f(im, hires_pack=True))(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=1e-4)

    def test_train_step_metrics_match_unpacked(self):
        # full fused step at a hires_pack-forced scale: losses must agree
        # with the unpacked program to float tolerance
        from pggan_tpu import Config
        from pggan_tpu.train import make_optimizers, make_train_step
        from pggan_tpu.train.step import init_train_state
        from pggan_tpu.models import (init_discriminator_params,
                                      init_generator_params)
        depths = [16, 16, 8]
        img = jnp.asarray(np.random.RandomState(1).randint(
            0, 256, (8, 16, 16, 3), dtype=np.uint8))
        metrics = {}
        for packed in (False, True):
            cfg = Config({"depths": depths, "latent_dim": 32,
                          "donate_buffers": False, "hires_pack": packed})
            rng = jax.random.PRNGKey(0)
            kg, kd, ks = jax.random.split(rng, 3)
            pG = init_generator_params(kg, latent_dim=32, depths=depths,
                                       scale=2)
            pD = init_discriminator_params(kd, depths=depths, scale=2)
            og, od = make_optimizers(cfg)
            state = init_train_state(ks, pG, pD, og, od)
            fn = make_train_step(cfg, 2, og, od)
            _, m, _ = fn(state, img, jnp.float32(0.3))
            metrics[packed] = {k: float(v) for k, v in m.items()}
        for key in metrics[False]:
            np.testing.assert_allclose(metrics[True][key],
                                       metrics[False][key],
                                       rtol=1e-3, atol=1e-4, err_msg=key)

    def test_train_step_returns_packed_images_and_trainer_unpacks(self):
        # at hires_pack the step returns sample-grid images PACKED
        # [B,R/2,R/2,12] (device-side unpack on every step was measured
        # waste); the trainer's host-side unpack must invert
        # space_to_depth2 exactly
        from pggan_tpu import Config
        from pggan_tpu.ops.packed import space_to_depth2
        from pggan_tpu.train import make_optimizers, make_train_step
        from pggan_tpu.train.step import init_train_state
        from pggan_tpu.train.trainer import _unpack_image_np
        from pggan_tpu.models import (init_discriminator_params,
                                      init_generator_params)
        depths = [16, 16, 8]
        img = jnp.asarray(np.random.RandomState(2).randint(
            0, 256, (8, 16, 16, 3), dtype=np.uint8))
        cfg = Config({"depths": depths, "latent_dim": 32,
                      "donate_buffers": False, "hires_pack": True})
        rng = jax.random.PRNGKey(0)
        kg, kd, ks = jax.random.split(rng, 3)
        pG = init_generator_params(kg, latent_dim=32, depths=depths, scale=2)
        pD = init_discriminator_params(kd, depths=depths, scale=2)
        og, od = make_optimizers(cfg)
        state = init_train_state(ks, pG, pD, og, od)
        fn = make_train_step(cfg, 2, og, od)
        _, _, (real_p, fake_p) = fn(state, img, jnp.float32(0.3))
        assert real_p.shape == (8, 8, 8, 12) and fake_p.shape == (8, 8, 8, 12)
        real = _unpack_image_np(np.asarray(real_p), packed=True)
        assert real.shape == (8, 16, 16, 3)
        # the unpacked real equals the faded normalized input: re-pack it
        # and compare against the step's packed output
        np.testing.assert_allclose(
            np.asarray(space_to_depth2(jnp.asarray(real))),
            np.asarray(real_p), rtol=1e-6, atol=1e-6)
        # passthrough when the caller says the image is not packed — even
        # for channel counts divisible by 4 (output_dim=4 is a real config)
        rgb = np.zeros((2, 4, 4, 3), np.float32)
        assert _unpack_image_np(rgb, packed=False) is rgb
        rgba = np.zeros((2, 4, 4, 4), np.float32)
        assert _unpack_image_np(rgba, packed=False) is rgba

    @pytest.mark.parametrize("levels", [1, 2])
    def test_generator_packed_matches_unpacked(self, levels):
        # G's packed top levels (conv0 sans depth-to-space, packed conv1 /
        # pixel_norm / torgb / RGB-domain blend) must emit the SAME image
        from pggan_tpu.models import generator_apply, init_generator_params
        depths = [16, 16, 8]
        p = init_generator_params(jax.random.PRNGKey(0), latent_dim=32,
                                  depths=depths, scale=2)
        z = jnp.asarray(np.random.RandomState(2).randn(4, 32), jnp.float32)
        for alpha in (0.0, 0.6, 1.0):
            a = jnp.float32(alpha)
            want = generator_apply(p, z, a)
            got = generator_apply(p, z, a, hires_pack=levels)
            assert got.shape == want.shape == (4, 16, 16, 3)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-4)

    def test_generator_packed_param_grads_match(self):
        from pggan_tpu.models import generator_apply, init_generator_params
        depths = [16, 16, 8]
        p = init_generator_params(jax.random.PRNGKey(1), latent_dim=32,
                                  depths=depths, scale=2)
        z = jnp.asarray(np.random.RandomState(3).randn(2, 32), jnp.float32)
        cot = jnp.asarray(np.random.RandomState(4).randn(2, 16, 16, 3),
                          jnp.float32)

        def loss(params, **kw):
            return jnp.sum(generator_apply(params, z, jnp.float32(0.5),
                                           **kw) * cot)

        want = jax.grad(loss)(p)
        got = jax.grad(lambda q: loss(q, hires_pack=True))(p)
        for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-4)

    def test_auto_threshold(self):
        # 'auto' must pack only at >=512px tops with depth <= 64
        from pggan_tpu import Config
        from pggan_tpu.train.step import resolve_hires_pack

        from pggan_tpu.config import default_depths
        depths = default_depths(8)
        cfg = Config({"depths": depths})
        assert resolve_hires_pack(cfg, 6) == 0  # 256² → res too small
        assert resolve_hires_pack(cfg, 7) == 1  # 512²/d32 only
        assert resolve_hires_pack(cfg, 8) == 2  # 1024²/d16 + 512²/d32
        assert resolve_hires_pack(Config({"depths": depths,
                                          "hires_pack": False}), 8) == 0
        forced = Config({"depths": depths, "hires_pack": True})
        assert resolve_hires_pack(forced, 2) == 1
        assert resolve_hires_pack(forced, 0) == 0   # no blocks to pack
        assert resolve_hires_pack(Config({"depths": depths,
                                          "hires_pack": 2}), 8) == 2
        assert resolve_hires_pack(Config({"depths": depths,
                                          "hires_pack": 5}), 2) == 2  # cap
