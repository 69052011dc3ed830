"""LBS blend + ARAP regularizer tests."""
import numpy as np
import jax
import jax.numpy as jnp

from dimo_tpu.models import deform
from dimo_tpu.ops import arap, quat


class TestLBS:
    def test_identity_deformation_is_noop(self):
        rng = np.random.RandomState(0)
        n, m = 20, 6
        xyz = jnp.asarray(rng.randn(n, 3), jnp.float32)
        rot = jnp.asarray(rng.randn(n, 4), jnp.float32)
        c = jnp.asarray(rng.randn(m, 3), jnp.float32)
        d_xyz = jnp.zeros((m, 3))
        d_rot = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (m, 1))
        c_rad = jnp.ones((m, 1)) * 0.5
        d2 = jnp.sum((xyz[:, None] - c[None]) ** 2, -1)
        idx = jnp.argsort(d2, axis=1)[:, :4].T           # (K, N) layout
        dist = jnp.sqrt(jnp.take_along_axis(d2, idx.T, 1)).T
        pts, out_rot = deform.lbs_blend(xyz, rot, c, d_xyz, d_rot, c_rad,
                                        idx, dist)
        np.testing.assert_allclose(pts, xyz, atol=1e-5)
        np.testing.assert_allclose(out_rot, quat.normalize(rot), atol=1e-5)

    def test_rigid_translation(self):
        """All cpts translate by v -> all gaussians translate by v."""
        rng = np.random.RandomState(1)
        n, m = 15, 5
        xyz = jnp.asarray(rng.randn(n, 3), jnp.float32)
        rot = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
        c = jnp.asarray(rng.randn(m, 3), jnp.float32)
        v = jnp.asarray([0.3, -0.2, 0.5])
        d_xyz = jnp.tile(v, (m, 1))
        d_rot = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (m, 1))
        c_rad = jnp.ones((m, 1)) * 0.8
        d2 = jnp.sum((xyz[:, None] - c[None]) ** 2, -1)
        idx = jnp.argsort(d2, axis=1)[:, :4].T           # (K, N) layout
        dist = jnp.sqrt(jnp.take_along_axis(d2, idx.T, 1)).T
        pts, _ = deform.lbs_blend(xyz, rot, c, d_xyz, d_rot, c_rad, idx, dist)
        np.testing.assert_allclose(pts, xyz + v, atol=1e-5)

    def test_weights_sum_to_one(self):
        d = jnp.asarray(np.random.RandomState(2).rand(4, 10), jnp.float32)
        r = jnp.asarray(np.random.RandomState(3).rand(4, 10) + 0.1, jnp.float32)
        w = deform.knn_weights(d, r)
        np.testing.assert_allclose(jnp.sum(w, 0), 1.0, atol=1e-5)


class TestARAP:
    def _cluster(self, n=24, seed=0):
        rng = np.random.RandomState(seed)
        return rng.rand(n, 3).astype(np.float32) * 0.15  # within 0.1-ish radius

    def test_rigid_motion_zero_energy(self):
        pts = self._cluster()
        # rigid: rotate + translate every frame
        frames = [pts]
        ang = 0.4
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        frames.append(pts @ R.T + np.array([0.3, 0, 0], np.float32))
        traj = jnp.asarray(np.stack(frames))
        idx, mask = arap.connectivity_shared(traj, k=6, radius=0.2)
        err = float(arap.arap_error(traj, idx, mask))
        assert err < 1e-6

    def test_stretch_positive_energy(self):
        pts = self._cluster()
        frames = [pts, pts * 1.8]  # non-rigid scaling
        traj = jnp.asarray(np.stack(frames))
        idx, mask = arap.connectivity_shared(traj, k=6, radius=0.4)
        err = float(arap.arap_error(traj, idx, mask))
        assert err > 1e-3

    def test_gradient_flows_to_deformation(self):
        pts = jnp.asarray(self._cluster())

        def f(d):
            d_xyz_t = jnp.stack([jnp.zeros_like(pts), d])
            return arap.arap_loss(pts, d_xyz_t, radius=0.4)

        d0 = jnp.asarray(np.random.RandomState(1).randn(*pts.shape) * 0.05,
                         jnp.float32)
        g = jax.grad(f)(d0)
        assert float(jnp.abs(g).sum()) > 0
        assert np.all(np.isfinite(np.asarray(g)))

    def test_valid_mask_excludes_nodes(self):
        pts = self._cluster()
        traj = jnp.asarray(np.stack([pts, pts * 1.5]))
        valid = jnp.zeros((pts.shape[0],), bool)
        idx, mask = arap.connectivity_shared(traj, k=6, radius=0.4, valid=valid)
        assert not bool(jnp.any(mask))


class TestARAPSampled:
    """Node-subsampled path (reference cal_arap_error sample_num=512,
    `utils/deform_utils.py:219-224`) — must avoid (T,N,N) materialization."""

    def test_sampled_matches_dense_semantics(self):
        """Rigid motion -> ~0 energy; stretch -> positive, through sampling."""
        rng = np.random.RandomState(0)
        pts = rng.rand(600, 3).astype(np.float32) * 0.5
        ang = 0.3
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        rigid_d = (pts @ R.T + np.array([0.1, 0, 0], np.float32)) - pts

        key = jax.random.PRNGKey(0)
        zero = jnp.zeros_like(jnp.asarray(pts))
        e_rigid = float(arap.arap_loss(
            jnp.asarray(pts), jnp.stack([zero, jnp.asarray(rigid_d)]),
            radius=0.2, sample_num=128, rng=key))
        e_stretch = float(arap.arap_loss(
            jnp.asarray(pts), jnp.stack([zero, jnp.asarray(pts) * 0.8]),
            radius=0.2, sample_num=128, rng=key))
        assert e_rigid < 1e-4
        assert e_stretch > 1e-2

    def test_large_n_runs_without_tnn(self):
        """Capacity-scale node count: (T,N,N) would be 8*20k*20k*4 = 12.8 GB.
        Passing = the sampled path never builds it."""
        rng = np.random.RandomState(1)
        n = 20_000
        pts = jnp.asarray(rng.rand(n, 3), jnp.float32)
        d = jnp.asarray(rng.randn(2, n, 3) * 0.01, jnp.float32)
        valid = jnp.ones((n,), bool).at[-100:].set(False)

        def f(dd):
            return arap.arap_loss(pts, dd, valid=valid, radius=0.1,
                                  rng=jax.random.PRNGKey(2))

        val, g = jax.value_and_grad(f)(d)
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_rng_required_at_scale(self):
        pts = jnp.zeros((1000, 3))
        d = jnp.zeros((2, 1000, 3))
        try:
            arap.arap_loss(pts, d, sample_num=128)
            assert False, "expected ValueError"
        except ValueError:
            pass
