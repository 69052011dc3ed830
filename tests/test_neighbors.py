"""Tests for neighbor ops vs numpy brute force."""
import numpy as np
import jax.numpy as jnp

from dimo_tpu.ops import neighbors


def _np_knn(q, r, k):
    d2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return np.sqrt(np.take_along_axis(d2, idx, 1)), idx


class TestKNN:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(0)
        q = rng.randn(50, 3).astype(np.float32)
        r = rng.randn(32, 3).astype(np.float32)
        d, i = neighbors.knn(jnp.asarray(q), jnp.asarray(r), 4)
        nd, ni = _np_knn(q, r, 4)
        np.testing.assert_allclose(np.asarray(d), nd, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), ni)

    def test_knn_self_excludes_self(self):
        rng = np.random.RandomState(1)
        p = rng.randn(20, 3).astype(np.float32)
        d2, i = neighbors.knn_self(jnp.asarray(p), 3)
        assert not np.any(np.asarray(i) == np.arange(20)[:, None])


class TestMeanSqDist3NN:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(2)
        p = rng.randn(100, 3).astype(np.float32)
        out = np.asarray(neighbors.mean_sq_dist_3nn(jnp.asarray(p), chunk=32))
        d2 = ((p[:, None] - p[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        expect = np.sort(d2, axis=1)[:, :3].mean(1)
        np.testing.assert_allclose(out, expect, rtol=1e-4)


class TestFPS:
    def test_spread(self):
        # two clusters: fps with k=2 must pick one from each
        p = np.concatenate([np.zeros((10, 3)), np.ones((10, 3)) * 5]).astype(np.float32)
        idx = np.asarray(neighbors.farthest_point_sampling(jnp.asarray(p), 2))
        assert (idx[0] < 10) != (idx[1] < 10)

    def test_respects_valid_mask(self):
        p = np.random.RandomState(3).randn(30, 3).astype(np.float32)
        valid = np.zeros(30, bool)
        valid[10:20] = True
        idx = np.asarray(neighbors.farthest_point_sampling(
            jnp.asarray(p), 5, jnp.asarray(valid)))
        assert np.all((idx >= 10) & (idx < 20))


class TestBallQuery:
    def test_radius_respected(self):
        rng = np.random.RandomState(4)
        p = rng.randn(40, 3).astype(np.float32)
        d2, idx = neighbors.ball_query(jnp.asarray(p), jnp.asarray(p), 8, 0.5,
                                       exclude_self=True)
        d2, idx = np.asarray(d2), np.asarray(idx)
        assert np.all(d2[idx >= 0] < 0.25 + 1e-6)
        # every returned neighbor really is within radius
        for i in range(40):
            for j, n in enumerate(idx[i]):
                if n >= 0:
                    true = ((p[i] - p[n]) ** 2).sum()
                    np.testing.assert_allclose(d2[i, j], true, rtol=1e-3, atol=1e-5)


class TestChamfer:
    def test_forward_chamfer(self):
        rng = np.random.RandomState(5)
        x = rng.randn(20, 3).astype(np.float32)
        y = rng.randn(30, 3).astype(np.float32)
        out = float(neighbors.chamfer_forward(jnp.asarray(x), jnp.asarray(y)))
        d2 = ((x[:, None] - y[None]) ** 2).sum(-1)
        np.testing.assert_allclose(out, d2.min(1).sum(), rtol=1e-4)
