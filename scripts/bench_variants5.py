import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Round-2 micro-benchmarks, part 5: Pallas smallgather + new lbs_blend."""
import time
import numpy as np, jax, jax.numpy as jnp

from dimo_tpu.models import deform as deform_mod
from dimo_tpu.ops import smallgather as sg

N, M, K = 100_000, 512, 4
rng = np.random.RandomState(0)
xyz = jnp.asarray(rng.randn(N, 3), jnp.float32)
rot = jnp.asarray(rng.randn(N, 4), jnp.float32)
c_xyz = jnp.asarray(rng.randn(M, 3), jnp.float32)
d_xyz = jnp.asarray(rng.randn(M, 3) * 0.1, jnp.float32)
d_rot = jnp.asarray(rng.randn(M, 4) * 0.1, jnp.float32)
c_rad = jnp.asarray(rng.rand(M, 1) + 0.1, jnp.float32)
nn_idx = jnp.asarray(rng.randint(0, M, (N, K)), jnp.int32)
nn_dist = jnp.asarray(rng.rand(N, K), jnp.float32)
table = jnp.asarray(rng.randn(M, 11), jnp.float32)


@jax.jit
def gs_fwd(t, i):
    return sg.gather_small(t, i)


@jax.jit
def gs_fwd_bwd(t, i):
    return jax.grad(lambda tt: jnp.sum(sg.gather_small(tt, i)))(t)


@jax.jit
def lbs(x, r, c, d, dr, cr, i, dist):
    return deform_mod.lbs_blend(x, r, c, d, dr, cr, i, dist)


@jax.jit
def lbs_grad(x, r, c, d, dr, cr, i, dist):
    def f(c, d, dr, cr):
        p, q = deform_mod.lbs_blend(x, r, c, d, dr, cr, i, dist)
        return jnp.sum(p) + jnp.sum(q)
    return jax.grad(f, argnums=(0, 1, 2, 3))(c, d, dr, cr)


def bench(f, *a, n=30, label=""):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{label:34s} {(time.time()-t0)/n*1000:9.2f} ms")
    return r

# correctness vs xla oracle on-device
o1 = gs_fwd(table, nn_idx)
o2 = sg.gather_small_xla(table, nn_idx)
print("pallas-vs-xla fwd:", float(jnp.abs(o1 - o2).max()))

bench(gs_fwd, table, nn_idx, label="gather_small pallas fwd (400k)")
bench(gs_fwd_bwd, table, nn_idx, label="gather_small pallas fwd+bwd")
bench(lbs, xyz, rot, c_xyz, d_xyz, d_rot, c_rad, nn_idx, nn_dist, label="lbs_blend fwd")
bench(lbs_grad, xyz, rot, c_xyz, d_xyz, d_rot, c_rad, nn_idx, nn_dist, label="lbs_blend fwd+bwd")
