"""Generator/Discriminator structural + semantic tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pggan_tpu.models import (
    init_generator_params, grow_generator_params, generator_apply,
    init_discriminator_params, grow_discriminator_params, discriminator_apply,
)
from pggan_tpu.models.generator import generator_output_resolution

DEPTHS = [32, 32, 16, 8]
LATENT = 64


def g_params(scale, rng=0):
    return init_generator_params(
        jax.random.PRNGKey(rng), latent_dim=LATENT, depths=DEPTHS, scale=scale)


def d_params(scale, rng=1):
    return init_discriminator_params(
        jax.random.PRNGKey(rng), depths=DEPTHS, scale=scale)


class TestGenerator:
    @pytest.mark.parametrize("scale", [0, 1, 2, 3])
    def test_output_resolution(self, scale):
        p = g_params(scale)
        z = jax.random.normal(jax.random.PRNGKey(2), (2, LATENT))
        img = generator_apply(p, z, jnp.float32(0.5))
        res = 2 ** (scale + 2)
        assert img.shape == (2, res, res, 3)
        assert generator_output_resolution(p) == res

    def test_growth_matches_fresh_init(self):
        # Deterministic per-component keys: growing scale-0 params equals a
        # fresh scale-1 init from the same base rng.
        rng = jax.random.PRNGKey(7)
        fresh = init_generator_params(rng, latent_dim=LATENT, depths=DEPTHS, scale=2)
        grown = init_generator_params(rng, latent_dim=LATENT, depths=DEPTHS, scale=0)
        grown = grow_generator_params(grown, rng, depths=DEPTHS)
        grown = grow_generator_params(grown, rng, depths=DEPTHS)
        # structure equality FIRST: zip truncates silently, and the
        # growth-appended leaves (torgb/fromrgb heads) sort LAST in
        # traversal order — a grow bug dropping them would pass a bare zip
        assert (jax.tree.structure(fresh) == jax.tree.structure(grown))
        for a, b in zip(jax.tree.leaves(fresh), jax.tree.leaves(grown)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_growth_preserves_old_weights(self):
        p0 = g_params(1)
        p1 = grow_generator_params(p0, jax.random.PRNGKey(0), depths=DEPTHS)
        np.testing.assert_array_equal(
            np.asarray(p0["first_conv"]["w"]), np.asarray(p1["first_conv"]["w"]))
        np.testing.assert_array_equal(
            np.asarray(p0["blocks"][0]["conv0"]["w"]),
            np.asarray(p1["blocks"][0]["conv0"]["w"]))

    def test_alpha_blend_semantics(self):
        # alpha=0 → output is upscaled toRGB of the penultimate feature, so
        # a fresh block must not perturb the image (pggan/nets.py:155-156).
        p1 = g_params(1, rng=3)
        z = jax.random.normal(jax.random.PRNGKey(4), (2, LATENT))
        out_a0 = generator_apply(p1, z, jnp.float32(0.0))
        # recompute the alpha=0 path by hand: scale-0 forward + toRGB[0] + upscale
        p0 = {k: (v[:1] if k in ("blocks", "torgb") else v) for k, v in p1.items()}
        out_s0 = generator_apply({**p0, "blocks": []}, z, jnp.float32(1.0))
        from pggan_tpu.ops import upscale2d
        np.testing.assert_allclose(
            np.asarray(out_a0), np.asarray(upscale2d(out_s0)), rtol=1e-5, atol=1e-5)

    def test_alpha_one_ignores_lowres_path(self):
        p = g_params(1, rng=5)
        z = jax.random.normal(jax.random.PRNGKey(6), (1, LATENT))
        out = generator_apply(p, z, jnp.float32(1.0))
        # corrupt the penultimate toRGB — alpha=1 output must not change
        bad = jax.tree.map(lambda x: x, p)
        bad["torgb"] = [jax.tree.map(lambda x: x * 100.0, p["torgb"][0]), p["torgb"][1]]
        out_bad = generator_apply(bad, z, jnp.float32(1.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_bad), rtol=1e-6)

    def test_last_activation_tanh(self):
        p = g_params(0)
        z = jax.random.normal(jax.random.PRNGKey(2), (2, LATENT)) * 10
        img = generator_apply(p, z, 0.0, last_activation="tanh")
        assert np.all(np.abs(np.asarray(img)) <= 1.0)

    def test_jit_compiles_per_scale(self):
        f = jax.jit(lambda p, z, a: generator_apply(p, z, a))
        z = jax.random.normal(jax.random.PRNGKey(0), (2, LATENT))
        for scale in (0, 1):
            img = f(g_params(scale), z, jnp.float32(0.3))
            assert img.shape[1] == 2 ** (scale + 2)


class TestDiscriminator:
    @pytest.mark.parametrize("scale", [0, 1, 2, 3])
    def test_output_shape(self, scale):
        p = d_params(scale)
        res = 2 ** (scale + 2)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, res, res, 3))
        out = discriminator_apply(p, x, jnp.float32(0.5))
        assert out.shape == (4, 1)

    def test_get_feature(self):
        p = d_params(0)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 4, 3))
        out, feat = discriminator_apply(p, x, 0.0, get_feature=True)
        assert out.shape == (4, 1)
        assert feat.shape == (4, DEPTHS[0])

    def test_growth_matches_fresh_init(self):
        rng = jax.random.PRNGKey(8)
        fresh = init_discriminator_params(rng, depths=DEPTHS, scale=2)
        grown = init_discriminator_params(rng, depths=DEPTHS, scale=0)
        grown = grow_discriminator_params(grown, rng, depths=DEPTHS)
        grown = grow_discriminator_params(grown, rng, depths=DEPTHS)
        # structure equality FIRST: zip truncates silently, and the
        # growth-appended leaves (torgb/fromrgb heads) sort LAST in
        # traversal order — a grow bug dropping them would pass a bare zip
        assert (jax.tree.structure(fresh) == jax.tree.structure(grown))
        for a, b in zip(jax.tree.leaves(fresh), jax.tree.leaves(grown)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_alpha_zero_uses_downscaled_path(self):
        # alpha=0 → new outermost block must not affect the logits
        # (pggan/nets.py:263-265).
        p = d_params(1, rng=9)
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 3))
        out = discriminator_apply(p, x, jnp.float32(0.0))
        bad = dict(p)
        bad["blocks"] = [jax.tree.map(lambda v: v * 50.0, p["blocks"][0])]
        out_bad = discriminator_apply(bad, x, jnp.float32(0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_bad), rtol=1e-5, atol=1e-5)

    def test_minibatch_norm_toggle(self):
        # entry_dim differs by +1 (lib/blocks.py:241)
        p_on = init_discriminator_params(
            jax.random.PRNGKey(0), depths=DEPTHS, apply_minibatch_norm=True)
        p_off = init_discriminator_params(
            jax.random.PRNGKey(0), depths=DEPTHS, apply_minibatch_norm=False)
        assert p_on["last_conv"]["w"].shape[2] == DEPTHS[0] + 1
        assert p_off["last_conv"]["w"].shape[2] == DEPTHS[0]
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 4, 3))
        out = discriminator_apply(p_off, x, 0.0, apply_minibatch_norm=False)
        assert out.shape == (4, 1)

    def test_decision_layer_size(self):
        p = init_discriminator_params(
            jax.random.PRNGKey(0), depths=DEPTHS, decision_layer_size=5)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 4, 3))
        assert discriminator_apply(p, x, 0.0).shape == (4, 5)

    def test_grad_of_grad_through_d(self):
        # R1 requires d²/dθ d/dx — must be finite at every scale.
        p = d_params(1)
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 3))

        def loss(params):
            g = jax.grad(lambda im: jnp.sum(discriminator_apply(params, im, 0.5)))(x)
            return jnp.sum(g ** 2)

        grads = jax.grad(loss)(p)
        for leaf in jax.tree.leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf)))
