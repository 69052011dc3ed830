import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp

def bench(f, *a, n=5, label=""):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    print(f"{label:40s} {(time.time()-t0)/n*1000:9.1f} ms")

from __graft_entry__ import _flagship_scene
from dimo_tpu.models.renderer import find_knn
cfg, params, aux, _ = _flagship_scene()

bench(jax.jit(find_knn), params, aux, label="find_knn (100k x 512, k=4)")

rng = np.random.RandomState(0)
gtu8 = jnp.asarray(rng.randint(0,255,(16,512,512,3),np.uint8))
@jax.jit
def resize_gt(g):
    gf = g.astype(jnp.float32)/255.
    return jnp.transpose(jax.image.resize(gf, (16,512,512,3), "linear"), (0,3,1,2))
bench(resize_gt, gtu8, label="gt resize 512->512 B=16")

@jax.jit
def resize_gt2(g):
    gf = g.astype(jnp.float32)/255.
    return jnp.transpose(jax.image.resize(gf, (16,256,256,3), "linear"), (0,3,1,2))
bench(resize_gt2, gtu8, label="gt resize 512->256 B=16")

from dimo_tpu.train import optim
state = optim.init(params)
g = jax.tree.map(jnp.ones_like, params)
lrs = jax.tree.map(lambda x: jnp.asarray(1e-3), params)
bench(jax.jit(optim.update), params, g, state, lrs, label="adam update")

# taps grad overhead: grad wrt a (16,100k,2) zeros arg through a dummy use
from dimo_tpu.ops import image_losses as L
