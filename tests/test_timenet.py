"""TimeNet shape/init/behavior tests."""
import numpy as np
import jax
import jax.numpy as jnp

from dimo_tpu.models import timenet as T


class TestTimeNet:
    def setup_method(self):
        self.params = T.init_timenet(jax.random.PRNGKey(0), latent_dim=32)

    def test_input_dim(self):
        assert T.input_dim(32) == 60 + 12 + 32

    def test_identity_at_init(self):
        """Zero-init heads: delta-xyz == 0, delta-quat == identity."""
        pts = jnp.asarray(np.random.RandomState(0).randn(10, 3), jnp.float32)
        lat = jnp.zeros((32,))
        d_xyz, d_quat = T.apply_timenet(self.params, pts, 0.3, lat)
        np.testing.assert_allclose(d_xyz, 0.0, atol=1e-6)
        np.testing.assert_allclose(d_quat,
                                   np.tile([1, 0, 0, 0], (10, 1)), atol=1e-6)

    def test_batched_times(self):
        pts = jnp.asarray(np.random.RandomState(1).randn(7, 3), jnp.float32)
        lat = jnp.asarray(np.random.RandomState(2).randn(32), jnp.float32)
        d1, _ = T.apply_timenet(self.params, pts, 0.5, lat)
        # vmap over times == looped scalar calls
        times = jnp.asarray([0.1, 0.5, 0.9])
        dv, _ = jax.vmap(lambda t: T.apply_timenet(self.params, pts, t, lat))(times)
        assert dv.shape == (3, 7, 3)
        np.testing.assert_allclose(dv[1], d1, atol=1e-6)

    def test_gradients_flow_after_perturbation(self):
        # randomize head weights so outputs depend on inputs
        params = dict(self.params)
        params["pts_1_w"] = jax.random.normal(jax.random.PRNGKey(3), (256, 3)) * 0.01
        pts = jnp.asarray(np.random.RandomState(3).randn(5, 3), jnp.float32)
        lat = jnp.asarray(np.random.RandomState(4).randn(32), jnp.float32)

        def f(latent):
            d, _ = T.apply_timenet(params, pts, 0.2, latent)
            return jnp.sum(d ** 2)

        g = jax.grad(f)(lat)
        assert float(jnp.abs(g).sum()) > 0

    def test_param_groups_split(self):
        deform, deform_rot = T.split_param_groups(self.params)
        assert all(k.startswith("rot_") for k in deform_rot)
        assert not any(k.startswith("rot_") for k in deform)
        assert len(deform) + len(deform_rot) == len(self.params)

    def test_skip_layer_dims(self):
        # trunk_5 consumes width + input (skip concat after layer 4)
        assert self.params["trunk_5_w"].shape == (256 + T.input_dim(32), 256)
        assert self.params["trunk_4_w"].shape == (256, 256)
