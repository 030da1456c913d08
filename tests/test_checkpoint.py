"""Checkpoint round-trip tests, incl. schedule restore and re-growth."""

import os

import numpy as np
import jax
import pytest

from pggan_tpu.models import (init_generator_params, grow_generator_params)
from pggan_tpu.utils import checkpoint as ckpt_lib

DEPTHS = [16, 16, 8]


def params_at(scale, seed=0):
    return init_generator_params(
        jax.random.PRNGKey(seed), latent_dim=32, depths=DEPTHS, scale=scale)


class TestRoundTrip:
    def test_save_load_exact(self, tmp_path):
        p = params_at(1)
        ckpt_lib.save_checkpoint(str(tmp_path), "run0", "G", 100,
                                 params=p, meta={"args": {"x": 1}})
        arrays, opt, meta = ckpt_lib.load_checkpoint(str(tmp_path), "run0", "G", 100)
        assert meta["global_step"] == 100
        assert meta["args"] == {"x": 1}
        template = params_at(1, seed=9)   # different values, same structure
        restored = ckpt_lib.arrays_to_tree(template, arrays, strict=True)
        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_latest_alias(self, tmp_path):
        p = params_at(0)
        ckpt_lib.save_checkpoint(str(tmp_path), "run0", "G", 5, params=p)
        ckpt_lib.save_checkpoint(str(tmp_path), "run0", "G", 10, params=p)
        _, _, meta = ckpt_lib.load_checkpoint(str(tmp_path), "run0", "G", None)
        assert meta["global_step"] == 10   # latest wins

    def test_missing_returns_none(self, tmp_path):
        assert ckpt_lib.load_checkpoint(str(tmp_path), "nope", "G", None) is None

    def test_strict_mismatch_raises(self, tmp_path):
        p = params_at(0)
        ckpt_lib.save_checkpoint(str(tmp_path), "run0", "G", 1, params=p)
        arrays, _, _ = ckpt_lib.load_checkpoint(str(tmp_path), "run0", "G", 1)
        template = params_at(1)            # grown template ≠ saved structure
        with pytest.raises(KeyError):
            ckpt_lib.arrays_to_tree(template, arrays, strict=True)

    def test_nonstrict_partial_load(self, tmp_path):
        # the torch strict=False analog: load scale-0 weights into a grown
        # net, new block keeps its fresh init
        p0 = params_at(0)
        ckpt_lib.save_checkpoint(str(tmp_path), "run0", "G", 1, params=p0)
        arrays, _, _ = ckpt_lib.load_checkpoint(str(tmp_path), "run0", "G", 1)
        grown = grow_generator_params(params_at(0, seed=5), jax.random.PRNGKey(5),
                                      depths=DEPTHS)
        restored = ckpt_lib.arrays_to_tree(grown, arrays, strict=False)
        np.testing.assert_array_equal(np.asarray(restored["first_conv"]["w"]),
                                      np.asarray(p0["first_conv"]["w"]))
        np.testing.assert_array_equal(np.asarray(restored["blocks"][0]["conv0"]["w"]),
                                      np.asarray(grown["blocks"][0]["conv0"]["w"]))

    def test_shape_mismatch_raises(self, tmp_path):
        p = params_at(0)
        ckpt_lib.save_checkpoint(str(tmp_path), "run0", "G", 1, params=p)
        arrays, _, _ = ckpt_lib.load_checkpoint(str(tmp_path), "run0", "G", 1)
        bad = init_generator_params(jax.random.PRNGKey(0), latent_dim=16,
                                    depths=DEPTHS, scale=0)
        with pytest.raises(ValueError):
            ckpt_lib.arrays_to_tree(bad, arrays, strict=False)

    def test_opt_state_roundtrip(self, tmp_path):
        import optax
        p = params_at(0)
        opt = optax.adam(1e-3, b1=0.0, b2=0.99)
        st = opt.init(p)
        # make the moments non-trivial
        grads = jax.tree.map(lambda x: x * 0 + 1.0, p)
        _, st = opt.update(grads, st, p)
        ckpt_lib.save_checkpoint(str(tmp_path), "run0", "G", 1,
                                 params=p, opt_state=st)
        _, opt_arrays, _ = ckpt_lib.load_checkpoint(str(tmp_path), "run0", "G", 1)
        restored = ckpt_lib.arrays_to_tree(opt.init(p), opt_arrays, strict=True)
        for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
