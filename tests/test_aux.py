"""Tests for aux subsystems: stats, debug, metrics (FID), zoo, perceptual."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pggan_tpu.utils import stats
from pggan_tpu.utils.debug import (assert_shape, check_replication_consistency,
                                   nan_to_num, profiled_function)
from pggan_tpu.metrics import (frechet_distance, fid_between_sets,
                               RandomConvFeatures)


class TestStats:
    def setup_method(self):
        stats.reset()

    def test_report_and_collect(self):
        c = stats.Collector()
        stats.report("loss", 1.0)
        stats.report("loss", 3.0)
        c.update()
        assert c.num("loss") == 2
        assert c.mean("loss") == 2.0
        assert c.std("loss") == pytest.approx(1.0)

    def test_construction_baseline_excludes_history(self):
        # reference `Collector.__init__` runs update-then-clear
        # (training_stats.py:134-139): pre-construction reports are
        # baselined away, not surfaced by the first update()
        stats.report("loss", 100.0)
        c = stats.Collector()
        stats.report("loss", 2.0)
        c.update()
        assert c.num("loss") == 1
        assert c.mean("loss") == 2.0

    def test_delta_semantics(self):
        c = stats.Collector()
        stats.report("x", [1.0, 2.0])
        c.update()
        assert c.num("x") == 2
        stats.report("x", 5.0)
        c.update()
        assert c.num("x") == 1          # only the new sample
        assert c.mean("x") == 5.0

    def test_keep_previous_retains_stats_on_idle_rounds(self):
        # training_stats.py:161-167: an update() that saw no new reports
        # keeps the previous averages (the default), not NaN
        c = stats.Collector()
        stats.report("fid", 12.0)
        c.update()
        assert c.mean("fid") == 12.0
        c.update()                       # idle round
        assert c.mean("fid") == 12.0
        c2_vals = stats.Collector(keep_previous=False)
        stats.report("fid", 4.0)
        c2_vals.update()
        assert c2_vals.mean("fid") == 4.0

    def test_psum_moments_cross_device_mean(self):
        # psum of the MOMENT vector (training_stats.py:246-255): the
        # recorded mean is the true cross-device mean, not device_count×it
        import jax
        import jax.numpy as jnp
        from functools import partial
        n = jax.device_count()
        vals = jnp.arange(1.0, n + 1.0)          # per-device value i+1

        @partial(jax.pmap, axis_name="d")
        def f(v):
            return stats.psum_moments(v, "d")

        moments = f(vals)[0]                     # replicated result
        stats.report_moments("dloss", moments)
        c = stats.Collector()
        # collector baselined after report → re-report to surface it
        stats.report_moments("dloss", moments)
        c.update()
        assert c.num("dloss") == n
        assert c.mean("dloss") == pytest.approx((n + 1) / 2.0)

    def test_regex_filter(self):
        c = stats.Collector(r"train/.*")
        stats.report("train/loss", 1.0)
        stats.report("valid/loss", 2.0)
        c.update()
        assert c.names() == ["train/loss"]


class TestDebug:
    def test_assert_shape_ok(self):
        assert_shape(jnp.zeros((2, 3, 4)), (2, None, 4))

    def test_assert_shape_fails(self):
        with pytest.raises(AssertionError):
            assert_shape(jnp.zeros((2, 3)), (2, 4))
        with pytest.raises(AssertionError):
            assert_shape(jnp.zeros((2, 3)), (2, 3, 1))

    def test_nan_to_num(self):
        x = jnp.asarray([float("nan"), float("inf"), 1.0])
        out = np.asarray(nan_to_num(x))
        assert out[0] == 0.0 and np.isfinite(out).all()

    def test_profiled_function_passthrough(self):
        @profiled_function
        def f(x):
            return x * 2
        assert float(f(jnp.float32(3.0))) == 6.0

    def test_replication_consistency(self):
        from pggan_tpu.parallel import create_mesh, replicate
        mesh = create_mesh(devices=jax.devices())
        tree = {"w": jnp.ones((8, 8))}
        check_replication_consistency(replicate(tree, mesh))


class TestMiscLeftovers:
    def test_infinite_sampler_covers_and_shards(self):
        from pggan_tpu.data import InfiniteSampler
        import itertools
        # unshuffled stream is exact epoch repetition
        plain = list(itertools.islice(iter(InfiniteSampler(
            10, shuffle=False)), 20))
        assert plain == list(range(10)) * 2
        # windowed shuffle (reference semantics: incremental swaps, so
        # early repeats are possible) stays in range and eventually covers
        s = InfiniteSampler(10, seed=1)
        first = list(itertools.islice(iter(s), 100))
        assert set(first) == set(range(10))
        assert all(0 <= i < 10 for i in first)
        # round-robin replica sharding: rank streams are disjoint per step
        a = list(itertools.islice(iter(InfiniteSampler(
            10, rank=0, num_replicas=2, shuffle=False)), 5))
        b = list(itertools.islice(iter(InfiniteSampler(
            10, rank=1, num_replicas=2, shuffle=False)), 5))
        assert a == [0, 2, 4, 6, 8] and b == [1, 3, 5, 7, 9]

    def test_copy_matching_leaves(self):
        from pggan_tpu.utils.debug import copy_matching_leaves
        src = {"a": jnp.ones((2, 2)), "b": {"c": jnp.full((3,), 7.0)}}
        dst = {"a": jnp.zeros((2, 2)), "b": {"c": jnp.zeros((3,))},
               "extra": jnp.zeros((1,))}
        out = copy_matching_leaves(src, dst)
        np.testing.assert_array_equal(np.asarray(out["a"]), 1.0)
        np.testing.assert_array_equal(np.asarray(out["b"]["c"]), 7.0)
        np.testing.assert_array_equal(np.asarray(out["extra"]), 0.0)
        with pytest.raises(KeyError):
            copy_matching_leaves(src, dst, require_all=True)

    def test_print_tree_summary(self, capsys):
        from pggan_tpu.utils.debug import print_tree_summary
        from pggan_tpu.models import init_generator_params, generator_apply
        p = init_generator_params(jax.random.PRNGKey(0), latent_dim=16,
                                  depths=[8, 8], scale=1)
        z = jnp.zeros((2, 16))
        text = print_tree_summary(
            p, lambda pp, zz: generator_apply(pp, zz, jnp.float32(0.5)), z)
        assert "TOTAL" in text and "output shape(s): (2, 8, 8, 3)" in text


class TestFID:
    def test_identical_distributions_near_zero(self):
        rs = np.random.RandomState(0)
        mu = jnp.asarray(rs.randn(16), jnp.float32)
        a = rs.randn(16, 16).astype(np.float32)
        sigma = jnp.asarray(a @ a.T / 16 + np.eye(16, dtype=np.float32))
        d = float(frechet_distance(mu, sigma, mu, sigma))
        assert abs(d) < 1e-2

    def test_known_distance_diagonal(self):
        # analytic: distinct means, identity covs → ||Δμ||²
        mu1 = jnp.zeros((8,))
        mu2 = jnp.ones((8,)) * 2.0
        eye = jnp.eye(8)
        d = float(frechet_distance(mu1, eye, mu2, eye))
        assert d == pytest.approx(8 * 4.0, rel=1e-3)

    def test_end_to_end_sets(self):
        rs = np.random.RandomState(1)
        real = [rs.randint(0, 256, (8, 16, 16, 3), dtype=np.uint8) for _ in range(2)]
        fake_same = [r.copy() for r in real]
        fake_diff = [np.zeros((8, 16, 16, 3), dtype=np.uint8) for _ in range(2)]
        ex = RandomConvFeatures(feature_dim=64)
        d_same = fid_between_sets(real, fake_same, ex)
        d_diff = fid_between_sets(real, fake_diff, ex)
        assert d_same < 1e-2
        assert d_diff > d_same + 0.1


class TestKID:
    """metrics/kid.py — unbiased MMD² with the cubic polynomial kernel
    (Bińkowski et al. 2018 §4: k(x,y) = (xᵀy/d + 1)³)."""

    def test_matches_naive_double_loop(self):
        # golden: the vectorized estimator vs a literal O(n²) transcription
        # of the paper's formula
        from pggan_tpu.metrics import mmd2_unbiased
        rs = np.random.RandomState(0)
        x = rs.randn(7, 5)
        y = rs.randn(9, 5) + 0.3
        k = lambda a, b: (a @ b / 5.0 + 1.0) ** 3
        s_xx = sum(k(x[i], x[j]) for i in range(7) for j in range(7) if i != j)
        s_yy = sum(k(y[i], y[j]) for i in range(9) for j in range(9) if i != j)
        s_xy = sum(k(x[i], y[j]) for i in range(7) for j in range(9))
        want = s_xx / (7 * 6) + s_yy / (9 * 8) - 2 * s_xy / (7 * 9)
        got = mmd2_unbiased(x, y)
        assert got == pytest.approx(want, rel=1e-12)

    def test_unbiased_near_zero_on_same_distribution(self):
        # same-distribution disjoint halves: unbiased → mean ≈ 0 (can go
        # slightly negative, unlike FID); different distribution → clearly
        # positive and larger
        from pggan_tpu.metrics import kid_between_features
        rs = np.random.RandomState(1)
        pool = rs.randn(400, 16)
        same, _ = kid_between_features(pool[:200], pool[200:])
        diff, _ = kid_between_features(pool[:200], rs.randn(200, 16) + 0.5)
        assert abs(same) < 0.05
        assert diff > same + 0.05

    def test_small_n_level_is_meaningful(self):
        # the reason KID exists here: at n=29, FID's level is dominated by
        # covariance-estimator bias (identical distributions score >> 0)
        # while KID's unbiased level stays near zero
        from pggan_tpu.metrics import frechet_distance, kid_between_features
        rs = np.random.RandomState(2)
        a, b = rs.randn(29, 64), rs.randn(29, 64)
        kid, _ = kid_between_features(a, b)
        fid = frechet_distance(a.mean(0), np.cov(a, rowvar=False),
                               b.mean(0), np.cov(b, rowvar=False))
        assert abs(kid) < 0.05
        assert fid > 1.0  # small-sample bias floor

    def test_subset_resampling_and_clamp(self):
        from pggan_tpu.metrics import kid_between_features
        rs = np.random.RandomState(3)
        a, b = rs.randn(50, 8), rs.randn(50, 8)
        # subset_size covering both (equal-size) sides → degenerates to one
        # full-set evaluation, no resampling noise to report
        full, std0 = kid_between_features(a, b, subset_size=1000)
        assert std0 == 0.0
        # smaller subsets → resampled mean close to full, nonzero std
        mean, std = kid_between_features(a, b, subset_size=32, n_subsets=50)
        assert std > 0.0
        assert mean == pytest.approx(full, abs=5 * std + 1e-6)

    def test_end_to_end_sets(self):
        from pggan_tpu.metrics import kid_between_sets
        rs = np.random.RandomState(4)
        real = [rs.randint(0, 256, (8, 16, 16, 3), dtype=np.uint8)
                for _ in range(2)]
        fake_diff = [np.zeros((8, 16, 16, 3), dtype=np.uint8)
                     for _ in range(2)]
        ex = RandomConvFeatures(feature_dim=64)
        same, _ = kid_between_sets(iter(real), iter([r.copy() for r in real]), ex)
        diff, _ = kid_between_sets(iter(real), iter(fake_diff), ex)
        assert diff > same + 1e-3

    def test_rejects_singleton_side(self):
        from pggan_tpu.metrics import mmd2_unbiased
        with pytest.raises(ValueError):
            mmd2_unbiased(np.zeros((1, 4)), np.zeros((8, 4)))

    def test_compute_activations_ragged_tail_batch(self):
        # a short trailing batch (e.g. 29 reals at batch 8 → 8,8,8,5) is
        # padded to the lead batch shape for extraction (one compile per
        # scale) and its features sliced back — exact because extractors
        # are per-sample
        from pggan_tpu.metrics import compute_activations
        ex = RandomConvFeatures(feature_dim=32)
        rs = np.random.RandomState(7)
        imgs = rs.uniform(-1, 1, (29, 16, 16, 3)).astype(np.float32)
        ragged = [imgs[0:8], imgs[8:16], imgs[16:24], imgs[24:29]]
        f = compute_activations(iter(ragged), ex)
        assert f.shape[0] == 29
        f_whole = compute_activations(iter([imgs]), ex)
        np.testing.assert_allclose(f, f_whole, rtol=1e-5, atol=1e-5)


class TestZoo:
    def test_patch_discriminator(self):
        from pggan_tpu.models.zoo import (init_patch_discriminator,
                                          patch_discriminator_apply)
        p = init_patch_discriminator(jax.random.PRNGKey(0), base_width=16)
        x = jnp.zeros((2, 64, 64, 3))
        out, feats = patch_discriminator_apply(p, x, get_features=True)
        assert out.shape[0] == 2 and out.shape[-1] == 1
        assert len(feats) == 4

    def test_multiscale(self):
        from pggan_tpu.models.zoo import (init_multiscale_discriminator,
                                          multiscale_discriminator_apply)
        p = init_multiscale_discriminator(jax.random.PRNGKey(0), num_scales=2,
                                          base_width=8)
        outs = multiscale_discriminator_apply(p, jnp.zeros((2, 32, 32, 3)))
        assert len(outs) == 2

    def test_latent_mlp(self):
        from pggan_tpu.models.zoo import (init_latent_discriminator,
                                          latent_discriminator_apply)
        p = init_latent_discriminator(jax.random.PRNGKey(0), code_dim=64,
                                      hidden=(32, 16))
        out = latent_discriminator_apply(p, jnp.zeros((4, 64)))
        assert out.shape == (4, 1)

    def test_stargan(self):
        from pggan_tpu.models.zoo import (init_stargan_discriminator,
                                          stargan_discriminator_apply)
        p = init_stargan_discriminator(jax.random.PRNGKey(0), img_size=32,
                                       num_domains=2)
        out = stargan_discriminator_apply(p, jnp.zeros((2, 32, 32, 3)))
        assert out.shape == (2, 2)


class TestPerceptual:
    def test_zero_for_identical(self):
        from pggan_tpu.losses.perceptual import PerceptualDistance
        pd = PerceptualDistance()
        x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
        assert float(pd(x, x)) == pytest.approx(0.0, abs=1e-6)

    def test_positive_for_different(self):
        from pggan_tpu.losses.perceptual import PerceptualDistance
        pd = PerceptualDistance()
        rs = np.random.RandomState(0)
        a = jnp.asarray(rs.randn(2, 32, 32, 3), jnp.float32)
        b = jnp.asarray(rs.randn(2, 32, 32, 3), jnp.float32)
        assert float(pd(a, b)) > 0.01

    def test_differentiable(self):
        from pggan_tpu.losses.perceptual import PerceptualDistance
        pd = PerceptualDistance()
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 3), jnp.float32)
        y = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 3), jnp.float32)
        g = jax.grad(lambda v: pd(v, y))(x)
        assert np.all(np.isfinite(np.asarray(g)))
