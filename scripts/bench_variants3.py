import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Self-consistency check: stage timings with REAL projected data vs synthetic,
in one process, plus end-to-end rasterize."""
import time
import numpy as np
import jax, jax.numpy as jnp
from dimo_tpu.ops.rasterizer import projection as P, tiles as T
from dimo_tpu.ops.rasterizer.composite_pallas import composite
from dimo_tpu.ops.rasterizer.gather import gather_rows
from dimo_tpu.ops.rasterizer import api
from dimo_tpu.utils import cameras

rng = np.random.RandomState(0)
N = 100_000
means = jnp.asarray(rng.uniform(-0.6, 0.6, (N, 3)), jnp.float32)
scales = jnp.asarray(np.exp(rng.uniform(-5.5, -4.0, (N, 3))), jnp.float32)
quats = jnp.asarray(rng.randn(N, 4), jnp.float32)
opac = jnp.asarray(rng.uniform(0.3, 0.9, (N, 1)), jnp.float32)
sh = jnp.asarray(rng.uniform(-.5, .5, (N, 1, 3)), jnp.float32)
cam = cameras.Camera.from_c2w(cameras.orbit_camera(10, 30, 2.0), 0.6, 0.6)
W = H = 512; CAP = 1024

@jax.jit
def proj_only():
    p = P.project(means, scales, quats, opac, sh, cam.world_view,
                  cam.full_proj, cam.campos, cam.tan_fovx, cam.tan_fovy, W, H)
    return p.mean2d, p.depth, p.conic, p.radius, p.in_frustum, p.color, p.normal

@jax.jit
def lists_only(mean2d, radius, depth, ok):
    L = T.build_tile_lists(mean2d, radius, depth, ok, H, W, CAP)
    return L.idx, L.count

@jax.jit
def gather_only(idx, mean2d, conic, op, color, depth, normal):
    attrs = T.pack_attrs(mean2d, conic, op, color, depth, normal)
    return gather_rows(attrs, idx)

@jax.jit
def comp_only(packed, counts):
    return composite(packed, counts, H, W)

@jax.jit
def full():
    out = api.rasterize(means, scales, quats, opac, sh, cam, W, H,
                        jnp.ones((3,)), capacity=CAP)
    return out.image

def bench(f, *a, n=30):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1000, r

t_p, pr = bench(proj_only)
mean2d, depth, conic, radius, ok, color, normal = pr
t_l, lr = bench(lists_only, mean2d, radius, depth, ok)
idx, count = lr
t_g, packed = bench(gather_only, idx, mean2d, conic, opac, color, depth, normal)
t_c, _ = bench(comp_only, packed, count.reshape(H//32, W//128))
t_f, _ = bench(full)
print(f"project:   {t_p:7.2f} ms")
print(f"lists:     {t_l:7.2f} ms")
print(f"gather:    {t_g:7.2f} ms")
print(f"composite: {t_c:7.2f} ms")
print(f"FULL rasterize: {t_f:7.2f} ms  (sum of stages {t_p+t_l+t_g+t_c:.2f})")

# same lists fn, synthetic inputs
m2s = jnp.asarray(rng.uniform(0, 512, (N, 2)), jnp.float32)
rs = jnp.asarray(rng.uniform(2, 12, (N,)), jnp.float32)
ds = jnp.asarray(rng.uniform(1, 3, (N,)), jnp.float32)
oks = jnp.ones((N,), bool)
t_l2, _ = bench(lists_only, m2s, rs, ds, oks)
print(f"lists(synthetic): {t_l2:7.2f} ms")

# repeat real to check drift
t_l3, _ = bench(lists_only, mean2d, radius, depth, ok)
print(f"lists(real again): {t_l3:7.2f} ms")
print("counts:", np.asarray(count).min(), np.asarray(count).max())
print("radius:", float(radius.min()), float(radius.max()), float(radius.mean()))
