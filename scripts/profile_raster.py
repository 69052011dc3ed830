import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp, time
from functools import partial
from dimo_tpu.ops.rasterizer import projection as P, tiles as T
from dimo_tpu.ops.rasterizer.composite_pallas import composite
from dimo_tpu.utils import cameras

rng = np.random.RandomState(0)
N = 100_000
means = jnp.asarray(rng.uniform(-0.6,0.6,(N,3)), jnp.float32)
scales = jnp.asarray(np.exp(rng.uniform(-5.5,-4.0,(N,3))), jnp.float32)
quats = jnp.asarray(rng.randn(N,4), jnp.float32)
opac = jnp.asarray(rng.uniform(0.3,0.9,(N,1)), jnp.float32)
sh = jnp.asarray(rng.uniform(-.5,.5,(N,1,3)), jnp.float32)
cam = cameras.Camera.from_c2w(cameras.orbit_camera(10,30,2.0), 0.6, 0.6)
W=H=512; CAP=1024

@jax.jit
def proj_only():
    p = P.project(means, scales, quats, opac, sh, cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx, cam.tan_fovy, W, H)
    return p.mean2d, p.depth, p.conic, p.radius, p.in_frustum, p.color, p.normal

@jax.jit
def lists_only(mean2d, radius, depth, ok):
    L = T.build_tile_lists(mean2d, radius, depth, ok, H, W, CAP)
    return L.idx, L.count

@jax.jit
def gather_only(idx, mean2d, conic, op, color, depth, normal):
    attrs = T.pack_attrs(mean2d, conic, op, color, depth, normal)
    return attrs[idx]

@jax.jit
def comp_only(packed, counts):
    return composite(packed, counts, H, W)

def bench(f, *a, n=20):
    r = f(*a); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return (time.time()-t0)/n*1000, r

t_p, pr = bench(proj_only)
mean2d, depth, conic, radius, ok, color, normal = pr
t_l, lr = bench(lists_only, mean2d, radius, depth, ok)
idx, count = lr
t_g, packed = bench(gather_only, idx, mean2d, conic, opac, color, depth, normal)
t_c, _ = bench(comp_only, packed, count.reshape(H//32, W//128))
print(f"project: {t_p:.2f} ms")
print(f"tile lists: {t_l:.2f} ms")
print(f"gather/pack: {t_g:.2f} ms")
print(f"composite: {t_c:.2f} ms")
print("counts:", np.asarray(count).min(), np.asarray(count).max(), np.asarray(count).mean())
