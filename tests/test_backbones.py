"""ResNet-18 / IR-SE backbone tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pggan_tpu.models.backbones import (init_resnet18, resnet18_apply,
                                        init_irse, irse_apply)


class TestResNet18:
    def test_final_feature_shape(self):
        p = init_resnet18(jax.random.PRNGKey(0))
        x = jnp.zeros((2, 64, 64, 3))
        out = resnet18_apply(p, x)
        assert out.shape == (2, 2, 2, 512)       # 64/32

    def test_stage_pyramid(self):
        p = init_resnet18(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 64, 64, 3))
        f8, f16, f32 = resnet18_apply(p, x, return_stages=True)
        assert f8.shape == (1, 8, 8, 128)
        assert f16.shape == (1, 4, 4, 256)
        assert f32.shape == (1, 2, 2, 512)

    def test_finite_on_random(self):
        p = init_resnet18(jax.random.PRNGKey(1))
        x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
        out = resnet18_apply(p, x)
        assert np.all(np.isfinite(np.asarray(out)))


class TestIRSE:
    def test_embedding_normalized(self):
        p = init_irse(jax.random.PRNGKey(0), num_layers=50, input_size=32)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
        emb = irse_apply(p, x)
        assert emb.shape == (2, 512)
        norms = np.linalg.norm(np.asarray(emb), axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-4)

    def test_different_inputs_different_embeddings(self):
        p = init_irse(jax.random.PRNGKey(0), input_size=32)
        rs = np.random.RandomState(0)
        a = jnp.asarray(rs.randn(1, 32, 32, 3), jnp.float32)
        b = jnp.asarray(rs.randn(1, 32, 32, 3), jnp.float32)
        ea, eb = irse_apply(p, a), irse_apply(p, b)
        cos = float(jnp.sum(ea * eb))
        assert cos < 0.999

    @pytest.mark.parametrize("layers", [50, 100, 152])
    def test_depth_variants_init(self, layers):
        p = init_irse(jax.random.PRNGKey(0), num_layers=layers, input_size=32)
        counts = [len(s) for s in p["stages"]]
        want = {50: [3, 4, 14, 3], 100: [3, 13, 30, 3], 152: [3, 8, 36, 3]}[layers]
        assert counts == want
