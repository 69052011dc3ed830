"""gather_rows custom VJP vs plain-indexing autodiff (the scatter path)."""
import numpy as np
import jax
import jax.numpy as jnp

from dimo_tpu.ops.rasterizer.gather import gather_rows


class TestGatherRows:
    def test_forward_matches_indexing(self):
        rng = np.random.RandomState(0)
        attrs = jnp.asarray(rng.randn(37, 5), jnp.float32)
        idx = jnp.asarray(rng.randint(0, 37, (4, 9)), jnp.int32)
        np.testing.assert_array_equal(gather_rows(attrs, idx), attrs[idx])

    def test_backward_matches_scatter_add(self):
        rng = np.random.RandomState(1)
        attrs = jnp.asarray(rng.randn(20, 3), jnp.float32)
        # repeated indices exercise the segment-sum accumulation
        idx = jnp.asarray(rng.randint(0, 20, (6, 11)), jnp.int32)
        w = jnp.asarray(rng.randn(6, 11, 3), jnp.float32)

        def f_custom(a):
            return jnp.sum(gather_rows(a, idx) * w)

        def f_plain(a):
            return jnp.sum(a[idx] * w)

        g_custom = jax.grad(f_custom)(attrs)
        g_plain = jax.grad(f_plain)(attrs)
        np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                                   atol=1e-5)

    def test_rows_never_gathered_get_zero_grad(self):
        attrs = jnp.ones((10, 2))
        idx = jnp.asarray([[0, 0, 1]], jnp.int32)

        def f(a):
            return jnp.sum(gather_rows(a, idx) ** 2)

        g = np.asarray(jax.grad(f)(attrs))
        assert g[0].sum() != 0 and g[1].sum() != 0
        np.testing.assert_allclose(g[2:], 0.0)

    def test_gather_small_matches_indexing(self):
        from dimo_tpu.ops.smallgather import gather_small
        rng = np.random.RandomState(2)
        table = jnp.asarray(rng.randn(33, 7), jnp.float32)
        idx = jnp.asarray(rng.randint(0, 33, (5, 4)), jnp.int32)
        np.testing.assert_allclose(gather_small(table, idx), table[idx],
                                   atol=5e-5)  # bf16 hi/lo split: ~6e-6 rel

    def test_gather_small_cols_fwd_and_grad(self):
        from dimo_tpu.ops.smallgather import gather_small_cols
        rng = np.random.RandomState(3)
        table = jnp.asarray(rng.randn(29, 11), jnp.float32)
        idx = jnp.asarray(rng.randint(0, 29, (4, 17)), jnp.int32)
        out = gather_small_cols(table.T, idx)          # (11, 4, 17)
        ref = jnp.transpose(table[idx], (2, 0, 1))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)

        w = jnp.asarray(rng.randn(11, 4, 17), jnp.float32)

        def f_custom(tt):
            return jnp.sum(gather_small_cols(tt, idx) * w)

        def f_plain(tt):
            return jnp.sum(jnp.transpose(tt.T[idx], (2, 0, 1)) * w)

        g_c = jax.grad(f_custom)(table.T)
        g_p = jax.grad(f_plain)(table.T)
        np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_p), atol=1e-4)

    def test_strongify_removes_weak_types(self):
        from dimo_tpu.train import optim
        tree = {"a": jnp.full((3,), 1.5), "b": jnp.zeros((2,), jnp.int32)}
        assert tree["a"].aval.weak_type
        out = optim.strongify(tree)
        assert not out["a"].aval.weak_type
        assert out["b"].dtype == jnp.int32
