"""Aux module tests: COLMAP helpers, diagnostics, viz utilities."""
import numpy as np
import pytest

from dimo_tpu.io import colmap
from dimo_tpu.utils import diagnostics
from dimo_tpu import viz


class TestColmap:
    def test_fov_focal_roundtrip(self):
        fov = 0.6
        f = colmap.fov2focal(fov, 512)
        assert colmap.focal2fov(f, 512) == pytest.approx(fov, abs=1e-6)

    def test_world2view_inverse(self):
        rng = np.random.RandomState(0)
        import scipy.spatial.transform as st
        R = st.Rotation.random(random_state=rng).as_matrix()
        t = rng.randn(3)
        w2c = colmap.get_world2view(R, t)
        c2w = np.linalg.inv(w2c)
        np.testing.assert_allclose(w2c @ c2w, np.eye(4), atol=1e-5)

    def test_nerfpp_norm(self):
        cams = [colmap.CameraInfo(uid=i, R=np.eye(3),
                                  T=np.array([0.0, 0, 2 + i]), fovx=0.6,
                                  fovy=0.6, width=64, height=64)
                for i in range(4)]
        norm = colmap.get_nerfpp_norm(cams)
        assert norm["radius"] > 0
        assert norm["translate"].shape == (3,)

    def test_orbit_poses(self):
        poses = colmap.uniform_orbit_poses(8, radius=2.0)
        assert len(poses) == 8
        for p in poses:
            np.testing.assert_allclose(np.linalg.norm(p[:3, 3]), 2.0,
                                       atol=1e-5)

    def test_video_nvs_cameras(self):
        cams = colmap.video_nvs_cameras(5, 64, 64, fovy=0.6)
        assert len(cams) == 5
        assert cams[0].world_view.shape == (4, 4)


class TestDiagnostics:
    def test_step_timer(self):
        import jax.numpy as jnp
        t = diagnostics.StepTimer()
        t.start()
        x = jnp.ones((8, 8)) * 2
        ms = t.stop(x)
        assert ms >= 0
        assert t.steps_per_sec > 0

    def test_nan_checks_toggle(self):
        import jax
        diagnostics.enable_nan_checks()
        assert jax.config.jax_debug_nans
        diagnostics.disable_nan_checks()
        assert not jax.config.jax_debug_nans


class TestViz:
    def test_plot_2d_tracks(self):
        frames = np.zeros((3, 64, 64, 3), np.uint8)
        tracks = np.random.RandomState(0).rand(3, 5, 2).astype(np.float32) * 60
        out = viz.plot_2d_tracks(frames, tracks)
        assert out.shape == (3, 64, 64, 3)
        assert out.sum() > 0  # something was drawn

    def test_trajectory_image(self):
        pts = np.random.RandomState(1).rand(4, 6, 2).astype(np.float32) * 60
        img, alpha = viz.trajectory_image(pts, 64, 64)
        assert img.shape == (64, 64, 3)
        assert alpha.max() > 0

    def test_project_points(self):
        from dimo_tpu.utils import cameras
        fov = 0.6
        cam = cameras.Camera.from_c2w(cameras.orbit_camera(0, 0, 2), fov, fov)
        pts = np.zeros((1, 3), np.float32)
        px = viz.project_points(pts, cam.full_proj, 64, 64)
        np.testing.assert_allclose(px[0], [32, 32], atol=1.0)
