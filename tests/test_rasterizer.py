"""Golden tests: tiled Pallas rasterizer vs dense autodiff oracle.

The oracle composites with plain jnp + JAX autodiff; the production path uses
tile binning + a Pallas kernel with a hand-written VJP. Agreement on outputs
AND gradients validates the custom VJP independently.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dimo_tpu.ops.rasterizer import rasterize, rasterize_dense
from dimo_tpu.utils import cameras

H, W = 64, 128
FOV = np.deg2rad(49.1)


def make_scene(n=40, seed=0):
    rng = np.random.RandomState(seed)
    means = rng.uniform(-0.6, 0.6, (n, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(-3.3, -2.2, (n, 3))).astype(np.float32)
    quats = rng.randn(n, 4).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, (n, 1)).astype(np.float32)
    sh = rng.uniform(-0.5, 0.5, (n, 1, 3)).astype(np.float32)
    cam = cameras.Camera.from_c2w(cameras.orbit_camera(10, 30, 2.0), FOV, FOV)
    return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(sh), cam)


BG = jnp.asarray([1.0, 1.0, 1.0])


class TestForwardAgreement:
    def test_image_depth_normal_alpha_match(self):
        means, scales, quats, opac, sh, cam = make_scene()
        tiled = rasterize(means, scales, quats, opac, sh, cam, W, H, BG,
                          capacity=64)
        dense = rasterize_dense(means, scales, quats, opac, sh, cam, W, H, BG)
        np.testing.assert_allclose(tiled.image, dense.image, atol=2e-5)
        np.testing.assert_allclose(tiled.alpha, dense.alpha, atol=2e-5)
        np.testing.assert_allclose(tiled.depth, dense.depth, atol=1e-4)
        np.testing.assert_allclose(tiled.normal, dense.normal, atol=2e-5)
        # scene actually renders something
        assert float(jnp.max(tiled.alpha)) > 0.5

    def test_empty_scene_is_background(self):
        means, scales, quats, opac, sh, cam = make_scene(5)
        out = rasterize(means, scales, quats, 0.0 * opac, sh, cam, W, H, BG,
                        capacity=8)
        np.testing.assert_allclose(out.image, 1.0, atol=1e-6)
        np.testing.assert_allclose(out.alpha, 0.0, atol=1e-6)

    def test_radii_positive_for_visible(self):
        means, scales, quats, opac, sh, cam = make_scene()
        out = rasterize(means, scales, quats, opac, sh, cam, W, H, BG,
                        capacity=64)
        assert int(jnp.sum(out.radii > 0)) > 30

    def test_valid_mask(self):
        means, scales, quats, opac, sh, cam = make_scene()
        valid = jnp.zeros((means.shape[0],), bool)
        out = rasterize(means, scales, quats, opac, sh, cam, W, H, BG,
                        capacity=64, valid=valid)
        np.testing.assert_allclose(out.image, 1.0, atol=1e-6)


class TestGradientAgreement:
    def _loss(self, raster, args, cam):
        means, scales, quats, opac, sh = args
        out = raster(means, scales, quats, opac, sh, cam, W, H, BG)
        # weighted multi-channel objective exercising every output
        return (jnp.sum(out.image * 1.3) + jnp.sum(out.alpha * 0.7)
                + jnp.sum(out.depth * 0.11) + jnp.sum(out.normal * 0.29))

    def test_grads_match_oracle(self):
        means, scales, quats, opac, sh, cam = make_scene(25, seed=3)
        args = (means, scales, quats, opac, sh)

        def loss_tiled(*a):
            return self._loss(
                lambda *aa, **kk: rasterize(*aa, capacity=32, **kk), a, cam)

        def loss_dense(*a):
            return self._loss(rasterize_dense, a, cam)

        g_tiled = jax.grad(loss_tiled, argnums=(0, 1, 2, 3, 4))(*args)
        g_dense = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(*args)
        names = ["means", "scales", "quats", "opacity", "sh"]
        for name, gt, gd in zip(names, g_tiled, g_dense):
            scale = np.maximum(np.abs(np.asarray(gd)).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(gt) / scale, np.asarray(gd) / scale, atol=5e-4,
                err_msg=f"gradient mismatch for {name}")

    def test_mean2d_tap_gradient(self):
        means, scales, quats, opac, sh, cam = make_scene(25, seed=4)
        tap = jnp.zeros((means.shape[0], 2))

        def loss(tap_):
            out = rasterize(means, scales, quats, opac, sh, cam, W, H, BG,
                            capacity=32, mean2d_tap=tap_)
            return jnp.sum(out.image)

        def loss_dense(tap_):
            out = rasterize_dense(means, scales, quats, opac, sh, cam, W, H, BG,
                                  mean2d_tap=tap_)
            return jnp.sum(out.image)

        gt = np.asarray(jax.grad(loss)(tap))
        gd = np.asarray(jax.grad(loss_dense)(tap))
        assert np.abs(gt).max() > 0  # tap actually carries gradient
        np.testing.assert_allclose(gt, gd, atol=5e-4 * max(1.0, np.abs(gd).max()))


class TestCapacity:
    def test_overflow_reported(self):
        means, scales, quats, opac, sh, cam = make_scene(60, seed=5)
        out_small = rasterize(means, scales, quats, opac, sh, cam, W, H, BG,
                              capacity=8)
        out_big = rasterize(means, scales, quats, opac, sh, cam, W, H, BG,
                            capacity=128)
        assert int(out_small.overflow) > 0
        assert int(out_big.overflow) == 0


class TestNonAlignedResolution:
    def test_padded_width_cropped(self):
        """Resolutions that aren't tile multiples (e.g. the reference's
        800x800 viewer size) render via padding + crop."""
        means, scales, quats, opac, sh, cam = make_scene(30, seed=6)
        out = rasterize(means, scales, quats, opac, sh, cam, 96, 72,
                        jnp.ones(3), capacity=32)
        dense = rasterize_dense(means, scales, quats, opac, sh, cam, 96, 72,
                                jnp.ones(3))
        assert out.image.shape == (3, 72, 96)
        np.testing.assert_allclose(out.image, dense.image, atol=2e-5)


class TestProjectionCovariance:
    def test_closed_form_matches_einsum(self):
        """The closed-form 2D covariance equals the explicit
        J (W Sigma W^T) J^T einsum chain."""
        from dimo_tpu.ops.rasterizer import projection as P
        from dimo_tpu.ops import quat as quat_ops
        rng = np.random.RandomState(0)
        n = 50
        means = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
        scales = jnp.asarray(np.exp(rng.uniform(-3, -2, (n, 3))), jnp.float32)
        quats = jnp.asarray(rng.randn(n, 4), jnp.float32)
        cam = cameras.Camera.from_c2w(cameras.orbit_camera(5, 40, 2.0), FOV, FOV)
        opac = jnp.ones((n, 1)) * 0.5
        sh = jnp.zeros((n, 1, 3))
        p = P.project(means, scales, quats, opac, sh, cam.world_view,
                      cam.full_proj, cam.campos, cam.tan_fovx, cam.tan_fovy,
                      W, H)
        # explicit reference chain
        hom = jnp.concatenate([means, jnp.ones((n, 1))], -1)
        p_view = hom @ cam.world_view
        tz = p_view[:, 2]
        fx = W / (2.0 * cam.tan_fovx)
        fy = H / (2.0 * cam.tan_fovy)
        limx, limy = 1.3 * cam.tan_fovx, 1.3 * cam.tan_fovy
        tx = jnp.clip(p_view[:, 0] / tz, -limx, limx) * tz
        ty = jnp.clip(p_view[:, 1] / tz, -limy, limy) * tz
        Rm = quat_ops.to_matrix(quats)
        M = Rm * scales[:, None, :]
        cov3d = M @ jnp.swapaxes(M, -1, -2)
        Rv = jnp.asarray(cam.world_view)[:3, :3].T
        covv = jnp.einsum("ij,njk,lk->nil", Rv, cov3d, Rv)
        zero = jnp.zeros_like(tz)
        J = jnp.stack([
            jnp.stack([fx / tz, zero, -(fx * tx) / (tz * tz)], -1),
            jnp.stack([zero, fy / tz, -(fy * ty) / (tz * tz)], -1)], -2)
        cov2d = jnp.einsum("nij,njk,nlk->nil", J, covv, J)
        a_ref = cov2d[:, 0, 0] + 0.3
        b_ref = cov2d[:, 0, 1]
        c_ref = cov2d[:, 1, 1] + 0.3
        det = a_ref * c_ref - b_ref ** 2
        conic_ref = jnp.stack([c_ref / det, -b_ref / det, a_ref / det], -1)
        np.testing.assert_allclose(np.asarray(p.conic), np.asarray(conic_ref),
                                   rtol=2e-3, atol=1e-3)
