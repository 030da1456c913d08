"""Serving export (pggan_tpu/export.py): StableHLO artifact round-trips.

The artifact must be self-contained — deserialize + call must reproduce
the live `generator_apply` (up to compile-level fusion noise) on the
same backend, for any batch
size when the batch dimension is symbolic.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pggan_tpu.export import export_generator, load_exported, sample
from pggan_tpu.models import generator_apply, init_generator_params

DEPTHS = [16, 16, 8]


def _params(scale=1):
    return init_generator_params(jax.random.PRNGKey(0), latent_dim=32,
                                 depths=DEPTHS, scale=scale)


class TestExportRoundTrip:
    def test_symbolic_batch_matches_live_forward(self, tmp_path):
        params = _params()
        path = str(tmp_path / "g.stablehlo")
        data = export_generator(params, latent_dim=32, alpha=0.7, path=path)
        assert (tmp_path / "g.stablehlo").read_bytes() == data
        exported = load_exported(path)
        for batch in (1, 3, 8):          # one artifact, any batch size
            z = jax.random.normal(jax.random.PRNGKey(batch), (batch, 32))
            got = np.asarray(exported.call(z))
            want = np.asarray(generator_apply(params, z, jnp.float32(0.7)))
            assert got.shape == (batch, 8, 8, 3)
            # separate compilations of the same HLO: fusion-order float
            # noise only
            np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_pinned_batch_rejects_other_batch(self):
        params = _params()
        exported = load_exported(export_generator(params, latent_dim=32,
                                                  batch=4))
        z_ok = jnp.zeros((4, 32))
        assert exported.call(z_ok).shape == (4, 8, 8, 3)
        # match the rejection REASON (a shape/dim mismatch) — a bare
        # Exception would also pass if the call path itself were broken
        with pytest.raises(Exception,
                           match=r"(?i)shape|dimension|rank|incompatible"):
            exported.call(jnp.zeros((2, 32)))

    def test_alpha_is_baked(self):
        params = _params()
        z = jax.random.normal(jax.random.PRNGKey(9), (2, 32))
        a_low = load_exported(export_generator(params, latent_dim=32,
                                               alpha=0.1))
        a_high = load_exported(export_generator(params, latent_dim=32,
                                                alpha=0.9))
        assert not np.allclose(np.asarray(a_low.call(z)),
                               np.asarray(a_high.call(z)))
        np.testing.assert_allclose(
            np.asarray(a_low.call(z)),
            np.asarray(generator_apply(params, z, jnp.float32(0.1))),
            atol=1e-5, rtol=1e-5)

    def test_sample_helper_uint8(self, tmp_path):
        params = _params()
        path = str(tmp_path / "g.bin")
        export_generator(params, latent_dim=32, path=path)
        imgs = sample(path, np.random.RandomState(0).randn(2, 32))
        assert imgs.dtype == np.uint8 and imgs.shape == (2, 8, 8, 3)

    def test_apply_kwargs_forwarded(self):
        params = _params()
        z = jax.random.normal(jax.random.PRNGKey(3), (2, 32))
        exported = load_exported(export_generator(
            params, latent_dim=32, last_activation="tanh"))
        want = np.asarray(generator_apply(params, z, jnp.float32(1.0),
                                          last_activation="tanh"))
        np.testing.assert_allclose(np.asarray(exported.call(z)), want,
                                   atol=1e-5, rtol=1e-5)
        assert np.all(np.abs(want) <= 1.0)
