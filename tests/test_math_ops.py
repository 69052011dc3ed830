"""Golden tests for the low-level math ops (quat, sh, posenc, schedules)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dimo_tpu.ops import quat, sh, posenc
from dimo_tpu.utils import schedules


class TestQuat:
    def test_identity(self):
        q = jnp.array([[1.0, 0, 0, 0]])
        R = quat.to_matrix(q)
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)

    def test_known_rotation_z90(self):
        # 90 deg about z: (w,x,y,z) = (cos45, 0, 0, sin45)
        s = np.sin(np.pi / 4)
        q = jnp.array([[np.cos(np.pi / 4), 0, 0, s]])
        R = np.asarray(quat.to_matrix(q))[0]
        v = R @ np.array([1.0, 0, 0])
        np.testing.assert_allclose(v, [0, 1, 0], atol=1e-6)

    def test_multiply_matches_matrix_product(self):
        rng = np.random.RandomState(0)
        q1 = quat.normalize(jnp.asarray(rng.randn(5, 4), jnp.float32))
        q2 = quat.normalize(jnp.asarray(rng.randn(5, 4), jnp.float32))
        R12 = np.asarray(quat.to_matrix(quat.multiply(q1, q2)))
        R1 = np.asarray(quat.to_matrix(q1))
        R2 = np.asarray(quat.to_matrix(q2))
        np.testing.assert_allclose(R12, R1 @ R2, atol=1e-5)

    def test_unnormalized_input_ok(self):
        q = jnp.array([[2.0, 0, 0, 0]])
        np.testing.assert_allclose(quat.to_matrix(q)[0], np.eye(3), atol=1e-6)


class TestSH:
    def test_deg0_constant(self):
        shc = jnp.ones((4, 3, 1))
        dirs = jnp.asarray(np.random.RandomState(0).randn(4, 3), jnp.float32)
        out = sh.eval_sh(0, shc, dirs)
        np.testing.assert_allclose(out, sh.C0, atol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.asarray(np.random.RandomState(1).rand(10, 3), jnp.float32)
        np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, atol=1e-6)

    def test_deg1_linear(self):
        # coefficient on sh[...,2] is +C1*z
        shc = np.zeros((1, 1, 4), np.float32)
        shc[0, 0, 2] = 1.0
        dirs = jnp.array([[0.0, 0.0, 1.0]])
        out = sh.eval_sh(1, jnp.asarray(shc), dirs)
        np.testing.assert_allclose(out, sh.C1, atol=1e-6)


class TestPosenc:
    def test_shape_and_values(self):
        x = jnp.array([[0.5, -0.25, 1.0]])
        enc = posenc.posenc(x, num_freqs=10)
        assert enc.shape == (1, 60)
        # freq 0 block: sin(x), cos(x) over dims
        np.testing.assert_allclose(enc[0, :3], np.sin([0.5, -0.25, 1.0]), atol=1e-6)
        np.testing.assert_allclose(enc[0, 3:6], np.cos([0.5, -0.25, 1.0]), atol=1e-6)
        # freq 1 block: sin(2x)
        np.testing.assert_allclose(enc[0, 6:9], np.sin([1.0, -0.5, 2.0]), atol=1e-6)

    def test_time_dim(self):
        t = jnp.array([[0.3]])
        enc = posenc.posenc(t, num_freqs=6)
        assert enc.shape == (1, 12)
        np.testing.assert_allclose(enc[0, 0], np.sin(0.3), atol=1e-6)


class TestSchedules:
    def test_expon_endpoints(self):
        f = schedules.expon_lr(1e-2, 1e-4, max_steps=100)
        np.testing.assert_allclose(f(0), 1e-2, rtol=1e-4)
        np.testing.assert_allclose(f(100), 1e-4, rtol=1e-4)
        np.testing.assert_allclose(f(50), np.sqrt(1e-2 * 1e-4), rtol=1e-4)

    def test_constant_when_equal(self):
        f = schedules.expon_lr(5e-3, 5e-3, max_steps=10)
        np.testing.assert_allclose(f(3), 5e-3, rtol=1e-6)

    def test_negative_step_disabled(self):
        f = schedules.expon_lr(1e-2, 1e-4, max_steps=100)
        np.testing.assert_allclose(f(-1), 0.0, atol=1e-8)
