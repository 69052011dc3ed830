import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Round-2 micro-benchmarks, part 4: LBS gather variants, KNN variants,
TimeNet pieces."""
import time
import numpy as np, jax, jax.numpy as jnp
from jax import lax

from dimo_tpu.models import deform as deform_mod
from dimo_tpu.ops import quat as quat_ops
from dimo_tpu.ops.neighbors import pairwise_sq_dists

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


def lbs_onehot(xyz, rotation, c_xyz, d_xyz_c, d_rot_c, c_radius, nn_idx,
               nn_dist):
    m = c_xyz.shape[0]
    n, k = nn_idx.shape
    table = jnp.concatenate([c_radius, c_xyz, d_xyz_c, d_rot_c], axis=1)
    oh = (nn_idx.reshape(-1)[:, None] ==
          jnp.arange(m, dtype=jnp.int32)[None]).astype(table.dtype)
    g = (oh @ table).reshape(n, k, table.shape[1])
    r_n = g[..., 0]
    c_n = g[..., 1:4]
    d_n = g[..., 4:7]
    q_n = g[..., 7:11]
    w = deform_mod.knn_weights(nn_dist, r_n)
    R_n = quat_ops.to_matrix(q_n)
    local = xyz[:, None, :] - c_n
    moved = jnp.einsum("nkij,nkj->nki", R_n, local) + c_n + d_n
    pts = jnp.sum(w[..., None] * moved, axis=1)
    rot_res = jnp.sum(w[..., None] * q_n, axis=1)
    out_rot = quat_ops.normalize(quat_ops.multiply(rot_res, rotation))
    return pts, out_rot


@jax.jit
def lbs_now(x, r, c, d, dr, cr, i, dist):
    return deform_mod.lbs_blend(x, r, c, d, dr, cr, i, dist)


@jax.jit
def lbs_oh(x, r, c, d, dr, cr, i, dist):
    return lbs_onehot(x, r, c, d, dr, cr, i, dist)


@jax.jit
def lbs_now_grad(x, r, c, d, dr, cr, i, dist):
    def f(c, d, dr, cr):
        p, q = deform_mod.lbs_blend(x, r, c, d, dr, cr, i, dist)
        return jnp.sum(p) + jnp.sum(q)
    return jax.grad(f, argnums=(0, 1, 2, 3))(c, d, dr, cr)


@jax.jit
def lbs_oh_grad(x, r, c, d, dr, cr, i, dist):
    def f(c, d, dr, cr):
        p, q = lbs_onehot(x, r, c, d, dr, cr, i, dist)
        return jnp.sum(p) + jnp.sum(q)
    return jax.grad(f, argnums=(0, 1, 2, 3))(c, d, dr, cr)


@jax.jit
def knn_topk(q, r):
    d2 = pairwise_sq_dists(q, r)
    neg, idx = lax.top_k(-d2, 4)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx


@jax.jit
def knn_argmax4(q, r):
    d2 = pairwise_sq_dists(q, r)
    m = r.shape[0]
    col = jnp.arange(m, dtype=jnp.int32)[None]
    ds, ids = [], []
    for _ in range(4):
        i = jnp.argmin(d2, axis=1)
        ds.append(jnp.min(d2, axis=1))
        ids.append(i)
        d2 = jnp.where(col == i[:, None], jnp.inf, d2)
    return (jnp.sqrt(jnp.maximum(jnp.stack(ds, 1), 0.0)),
            jnp.stack(ids, 1).astype(jnp.int32))


@jax.jit
def knn_approx(q, r):
    d2 = pairwise_sq_dists(q, r)
    neg, idx = lax.approx_max_k(-d2, 4)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx


from dimo_tpu.models import timenet as timenet_mod
from dimo_tpu.ops.posenc import posenc
tn = timenet_mod.init_timenet(jax.random.PRNGKey(0), 32)
cpts = jnp.asarray(rng.randn(512, 3), jnp.float32)
lat = jnp.asarray(rng.randn(32), jnp.float32)


@jax.jit
def timenet_now(p, pts, t):
    return timenet_mod.apply_timenet(p, pts, t, lat)


@jax.jit
def posenc_only(pts):
    return posenc(pts, 10)


def bench(f, *a, n=30, label=""):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{label:34s} {(time.time()-t0)/n*1000:9.2f} ms")
    return r

p1, q1 = lbs_now(xyz, rot, c_xyz, d_xyz, d_rot, c_rad, nn_idx, nn_dist)
p2, q2 = lbs_oh(xyz, rot, c_xyz, d_xyz, d_rot, c_rad, nn_idx, nn_dist)
print("lbs agree:", float(jnp.abs(p1 - p2).max()), float(jnp.abs(q1 - q2).max()))
d1, i1 = knn_topk(xyz, c_xyz)
d2_, i2 = knn_argmax4(xyz, c_xyz)
print("knn agree:", float(jnp.abs(d1 - d2_).max()), int((i1 != i2).sum()))

bench(lbs_now, xyz, rot, c_xyz, d_xyz, d_rot, c_rad, nn_idx, nn_dist, label="lbs current fwd")
bench(lbs_oh, xyz, rot, c_xyz, d_xyz, d_rot, c_rad, nn_idx, nn_dist, label="lbs onehot fwd")
bench(lbs_now_grad, xyz, rot, c_xyz, d_xyz, d_rot, c_rad, nn_idx, nn_dist, label="lbs current fwd+bwd(tables)")
bench(lbs_oh_grad, xyz, rot, c_xyz, d_xyz, d_rot, c_rad, nn_idx, nn_dist, label="lbs onehot fwd+bwd(tables)")
bench(knn_topk, xyz, c_xyz, label="knn top_k")
bench(knn_argmax4, xyz, c_xyz, label="knn argmax4")
try:
    bench(knn_approx, xyz, c_xyz, label="knn approx_max_k")
except Exception as e:
    print("knn approx FAILED", str(e)[:80])
bench(timenet_now, tn, cpts, 0.3, label="timenet 512")
bench(posenc_only, cpts, label="posenc 512")
bench(timenet_now, tn, jnp.asarray(rng.randn(8192, 3), jnp.float32), 0.3,
      label="timenet 8192")
