"""Camera convention tests: orbit poses, projection, clip-space mapping."""
import numpy as np
import pytest

from dimo_tpu.utils import cameras


class TestOrbitCamera:
    def test_front_view_position(self):
        # elevation 0, azimuth 0 -> camera at +z looking at origin
        c2w = cameras.orbit_camera(0, 0, radius=2)
        np.testing.assert_allclose(c2w[:3, 3], [0, 0, 2], atol=1e-6)
        # camera forward (+z col in OpenGL c2w) points away from target
        np.testing.assert_allclose(c2w[:3, 2], [0, 0, 1], atol=1e-6)

    def test_azimuth_90(self):
        c2w = cameras.orbit_camera(0, 90, radius=2)
        np.testing.assert_allclose(c2w[:3, 3], [2, 0, 0], atol=1e-6)

    def test_elevation_sign(self):
        c2w = cameras.orbit_camera(30, 0, radius=1)
        assert c2w[1, 3] < 0  # reference convention: +elev -> -y


class TestProjection:
    def test_center_point_projects_to_image_center(self):
        fov = np.deg2rad(49.1)
        c2w = cameras.orbit_camera(0, 0, radius=2)
        cam = cameras.Camera.from_c2w(c2w, fov, fov)
        p = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
        clip = p @ np.asarray(cam.full_proj)
        ndc = clip[:2] / clip[3]
        np.testing.assert_allclose(ndc, [0, 0], atol=1e-5)

    def test_depth_positive_in_front(self):
        fov = np.deg2rad(49.1)
        cam = cameras.Camera.from_c2w(cameras.orbit_camera(0, 0, 2), fov, fov)
        p = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
        view = p @ np.asarray(cam.world_view)
        assert view[2] == pytest.approx(2.0, abs=1e-5)

    def test_offcenter_direction(self):
        # a point to the camera's right should land at positive ndc x
        fov = np.deg2rad(60.0)
        cam = cameras.Camera.from_c2w(cameras.orbit_camera(0, 0, 2), fov, fov)
        p = np.array([0.5, 0.0, 0.0, 1.0], np.float32)
        clip = p @ np.asarray(cam.full_proj)
        ndc = clip[:2] / clip[3]
        assert abs(ndc[0]) > 1e-3 and abs(ndc[1]) < 1e-6

    def test_fovx_from_fovy(self):
        oc = cameras.OrbitCamera(800, 400, r=2, fovy=40)
        assert oc.fovx > oc.fovy

    def test_stack_cameras(self):
        fov = np.deg2rad(49.1)
        cams = [cameras.Camera.from_c2w(cameras.orbit_camera(0, a, 2), fov, fov)
                for a in (0, 90)]
        batch = cameras.stack_cameras(cams)
        assert batch.world_view.shape == (2, 4, 4)
        assert batch.campos.shape == (2, 3)
