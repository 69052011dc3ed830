import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Round-2 micro-benchmarks: candidate optimizations for the rasterizer
binning/gather stages. Run on the real TPU chip (one process at a time)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = 100_000
T, C = 64, 1024
ATTR = 16

rng = np.random.RandomState(0)
key4 = jnp.asarray(rng.randint(0, 1 << 29, size=(4 * N,)), jnp.int32)
val4 = jnp.asarray(rng.randint(0, N, size=(4 * N,)), jnp.int32)
key2 = key4[: 2 * N]
val2 = val4[: 2 * N]
key1 = key4[:N]
val1 = val4[:N]
attrs_f32 = jnp.asarray(rng.randn(N + 8, ATTR), jnp.float32)
attrs_bf16 = attrs_f32.astype(jnp.bfloat16)
idx_tc = jnp.asarray(rng.randint(0, N, size=(T, C)), jnp.int32)
rowk = jnp.asarray(rng.randint(0, 1 << 24, size=(T, 2048)), jnp.int32)
rowv = jnp.asarray(rng.randint(0, N, size=(T, 2048)), jnp.int32)

mean2d = jnp.asarray(rng.uniform(0, 512, (N, 2)), jnp.float32)
conic = jnp.asarray(rng.randn(N, 3), jnp.float32)
opac = jnp.asarray(rng.uniform(0, 1, (N, 1)), jnp.float32)
color = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
depthv = jnp.asarray(rng.uniform(1, 3, (N,)), jnp.float32)
normal = jnp.asarray(rng.randn(N, 3), jnp.float32)


@jax.jit
def sort_pair_4n(k, v):
    return lax.sort((k, v), num_keys=1)


@jax.jit
def sort_pair_2n(k, v):
    return lax.sort((k, v), num_keys=1)


@jax.jit
def sort_pair_1n(k, v):
    return lax.sort((k, v), num_keys=1)


@jax.jit
def sort_single_2n(k):
    return jnp.sort(k)


@jax.jit
def sort_single_4n(k):
    return jnp.sort(k)


@jax.jit
def rowsort(k, v):
    return lax.sort((k, v), num_keys=1, dimension=1)


@jax.jit
def gather_f32(a, idx):
    return a[idx]


@jax.jit
def gather_bf16(a, idx):
    return a[idx]


@jax.jit
def gather_then_f32(a, idx):
    return a[idx].astype(jnp.float32)


@jax.jit
def pack_attrs_now():
    from dimo_tpu.ops.rasterizer import tiles as Tm
    return Tm.pack_attrs(mean2d, conic, opac, color, depthv, normal)


@jax.jit
def readout(skey, sval):
    """searchsorted segment readout: the non-sort half of build_tile_lists."""
    tile_base = jnp.arange(T, dtype=jnp.int32) << 23
    starts = jnp.searchsorted(skey, tile_base)
    ends = jnp.searchsorted(skey, tile_base + (1 << 23))
    offs = starts[:, None] + jnp.arange(C, dtype=jnp.int32)[None]
    in_seg = offs < ends[:, None]
    offs_c = jnp.minimum(offs, skey.shape[0] - 1)
    dq = jnp.where(in_seg, skey[offs_c] & ((1 << 23) - 1), (1 << 23))
    ii = jnp.where(in_seg, sval[offs_c], N)
    return dq, ii


def bench(f, *a, n=50):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1000


sk4, sv4 = sort_pair_4n(key4, val4)
rows = [
    ("sort_pair_4N (400k)", lambda: sort_pair_4n(key4, val4)),
    ("sort_pair_2N (200k)", lambda: sort_pair_2n(key2, val2)),
    ("sort_pair_1N (100k)", lambda: sort_pair_1n(key1, val1)),
    ("sort_single_2N", lambda: sort_single_2n(key2)),
    ("sort_single_4N", lambda: sort_single_4n(key4)),
    ("rowsort (64,2048)", lambda: rowsort(rowk, rowv)),
    ("gather_f32 (64,1024,16)", lambda: gather_f32(attrs_f32, idx_tc)),
    ("gather_bf16", lambda: gather_bf16(attrs_bf16, idx_tc)),
    ("gather_bf16->f32", lambda: gather_then_f32(attrs_bf16, idx_tc)),
    ("pack_attrs", pack_attrs_now),
    ("readout(4N sorted)", lambda: readout(sk4, sv4)),
]
for name, f in rows:
    try:
        print(f"{name:28s} {bench(f):7.2f} ms")
    except Exception as e:
        print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")
