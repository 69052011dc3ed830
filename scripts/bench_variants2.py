import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Round-2 micro-benchmarks, part 2: explicit-arg versions + pipeline protos."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dimo_tpu.ops.rasterizer import tiles as Tm

N = 100_000
T, C = 64, 1024
S4 = 4 * N

rng = np.random.RandomState(0)
mean2d = jnp.asarray(rng.uniform(0, 512, (N, 2)), jnp.float32)
conic = jnp.asarray(rng.randn(N, 3), jnp.float32)
opac = jnp.asarray(rng.uniform(0, 1, (N, 1)), jnp.float32)
color = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
depthv = jnp.asarray(rng.uniform(1, 3, (N,)), jnp.float32)
normal = jnp.asarray(rng.randn(N, 3), jnp.float32)
radius = jnp.asarray(rng.uniform(2, 12, (N,)), jnp.float32)
ok = jnp.ones((N,), bool)

xk = jnp.asarray(rng.uniform(0, 1, (N,)), jnp.float32)
skey4 = jnp.sort(jnp.asarray(rng.randint(0, 1 << 29, (S4,)), jnp.int32))
sval4 = jnp.asarray(rng.randint(0, N, (S4,)), jnp.int32)
offs = jnp.asarray(rng.randint(0, S4, (T, C)), jnp.int32)
pairs = jnp.stack([skey4, sval4], axis=1)  # (S4, 2)
idx_tc = jnp.asarray(rng.randint(0, N, (T, C)), jnp.int32)


@jax.jit
def pack(m, c, o, col, d, nrm, r):
    return Tm.pack_attrs(m, c, o, col, d, nrm, radius=r)


@jax.jit
def pack_gather(m, c, o, col, d, nrm, r, idx):
    return Tm.pack_attrs(m, c, o, col, d, nrm, radius=r)[idx]


@jax.jit
def topk1024(x):
    return lax.top_k(x, 1024)


@jax.jit
def topk128(x):
    return lax.top_k(x, 128)


@jax.jit
def sort_compact(x):
    gid = jnp.arange(N, dtype=jnp.int32)
    return lax.sort((x, gid), num_keys=1)


@jax.jit
def gather_pairs(p, o):
    return p[o]  # (T, C, 2)


@jax.jit
def gather_scalar(sk, o):
    return sk[o]  # (T, C) from (S4,)


@jax.jit
def build_now(m2, r, d, okk):
    L = Tm.build_tile_lists(m2, r, d, okk, 512, 512, C)
    return L.idx, L.count, L.overflow


@jax.jit
def keybuild(m2, r, d, okk):
    cmin = jnp.floor((m2[:, 0] - r) / 128).astype(jnp.int32)
    cmax = jnp.floor((m2[:, 0] + r) / 128).astype(jnp.int32)
    rmin = jnp.floor((m2[:, 1] - r) / 32).astype(jnp.int32)
    rmax = jnp.floor((m2[:, 1] + r) / 32).astype(jnp.int32)
    dq = jnp.clip(d * 1000, 0, (1 << 23) - 1).astype(jnp.int32)
    dup_r = rmin[:, None] + jnp.arange(2, dtype=jnp.int32)[None]
    dup_c = cmin[:, None] + jnp.arange(2, dtype=jnp.int32)[None]
    tile = dup_r[:, :, None] * 4 + dup_c[:, None, :]
    v = ((dup_r[:, :, None] <= rmax[:, None, None])
         & (dup_c[:, None, :] <= cmax[:, None, None]) & okk[:, None, None])
    key = jnp.where(v, (tile << 23) | dq[:, None, None],
                    jnp.iinfo(jnp.int32).max).reshape(-1)
    val = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None, None],
                           tile.shape).reshape(-1)
    return key, val


def bench(f, *a, n=50):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1000


rows = [
    ("pack_attrs(args)", lambda: pack(mean2d, conic, opac, color, depthv, normal, radius)),
    ("pack+gather fused", lambda: pack_gather(mean2d, conic, opac, color, depthv, normal, radius, idx_tc)),
    ("topk k=1024 (N,)", lambda: topk1024(xk)),
    ("topk k=128 (N,)", lambda: topk128(xk)),
    ("sort_compact (N pair)", lambda: sort_compact(xk)),
    ("gather_pairs (400k,2)", lambda: gather_pairs(pairs, offs)),
    ("gather_scalar (400k,)", lambda: gather_scalar(skey4, offs)),
    ("keybuild", lambda: keybuild(mean2d, radius, depthv, ok)),
    ("build_tile_lists (now)", lambda: build_now(mean2d, radius, depthv, ok)),
]
for name, f in rows:
    try:
        print(f"{name:26s} {bench(f):7.2f} ms")
    except Exception as e:
        print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:120]}")
