import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Micro-benchmark: tile-list compaction variants on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

T, N, C = 64, 100_000, 1024
NROWS, NCOLS = 16, 4

rng = np.random.RandomState(0)
mx = jnp.asarray(rng.uniform(0, 512, N), jnp.float32)
my = jnp.asarray(rng.uniform(0, 512, N), jnp.float32)
r = jnp.asarray(rng.uniform(2, 12, N), jnp.float32)
ok = jnp.ones((N,), bool)

def bboxes():
    cmin = jnp.floor((mx - r) / 128).astype(jnp.int32)
    cmax = jnp.floor((mx + r) / 128).astype(jnp.int32)
    rmin = jnp.floor((my - r) / 32).astype(jnp.int32)
    rmax = jnp.floor((my + r) / 32).astype(jnp.int32)
    return cmin, cmax, rmin, rmax

def overlap_TN():
    cmin, cmax, rmin, rmax = bboxes()
    tr = (jnp.arange(T, dtype=jnp.int32) // NCOLS)[:, None]
    tc = (jnp.arange(T, dtype=jnp.int32) % NCOLS)[:, None]
    return (ok[None] & (tc >= cmin[None]) & (tc <= cmax[None])
            & (tr >= rmin[None]) & (tr <= rmax[None]))

@jax.jit
def v_searchsorted():
    ov = overlap_TN()
    pos = jnp.cumsum(ov.astype(jnp.int32), axis=1)
    q = jnp.arange(1, C + 1, dtype=jnp.int32)
    slot = jax.vmap(lambda row: jnp.searchsorted(row, q, side="left"))(pos)
    return slot

@jax.jit
def v_searchsorted_NT():
    ov = overlap_TN().T  # (N, T)
    pos = jnp.cumsum(ov.astype(jnp.int32), axis=0)
    q = jnp.arange(1, C + 1, dtype=jnp.int32)
    slot = jax.vmap(lambda col: jnp.searchsorted(col, q, side="left"),
                    in_axes=1)(pos)
    return slot

@jax.jit
def v_topk():
    ov = overlap_TN()
    ranks = jnp.where(ov, jnp.arange(N, dtype=jnp.int32)[None], N)
    neg, idx = lax.top_k(-ranks, C)
    return idx

@jax.jit
def v_sort_dup():
    # bounded duplication (K=8: 2 rows x 4 cols) + one global sort
    cmin, cmax, rmin, rmax = bboxes()
    KR, KC = 2, 4
    dup_r = rmin[:, None] + jnp.arange(KR, dtype=jnp.int32)[None]   # (N, KR)
    dup_c = cmin[:, None] + jnp.arange(KC, dtype=jnp.int32)[None]   # (N, KC)
    tile = (dup_r[:, :, None] * NCOLS + dup_c[:, None, :])          # (N,KR,KC)
    valid = ((dup_r[:, :, None] <= rmax[:, None, None])
             & (dup_c[:, None, :] <= cmax[:, None, None])
             & (dup_r[:, :, None] >= 0) & (dup_c[:, None, :] >= 0)
             & (dup_r[:, :, None] < NROWS) & (dup_c[:, None, :] < NCOLS)
             & ok[:, None, None])
    gid = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None, None],
                           tile.shape)
    key = jnp.where(valid, tile * N + gid, jnp.iinfo(jnp.int32).max)
    key = key.reshape(-1)
    skey = jnp.sort(key)
    # per-tile segment starts
    starts = jnp.searchsorted(skey, jnp.arange(T, dtype=jnp.int32) * N)
    offs = starts[:, None] + jnp.arange(C)[None]
    vals = skey[jnp.minimum(offs, key.shape[0] - 1)]
    tile_of = (vals // N).astype(jnp.int32)
    gidx = (vals % N).astype(jnp.int32)
    good = tile_of == jnp.arange(T, dtype=jnp.int32)[:, None]
    return jnp.where(good, gidx, N)

def bench(f, n=30):
    r = f(); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1000

for name, f in [("searchsorted_TN", v_searchsorted),
                ("searchsorted_NT", v_searchsorted_NT),
                ("topk", v_topk),
                ("sort_dup8", v_sort_dup)]:
    try:
        print(f"{name:18s} {bench(f):7.2f} ms")
    except Exception as e:
        print(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:100]}")
