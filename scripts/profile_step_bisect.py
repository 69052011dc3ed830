import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp

from __graft_entry__ import _flagship_scene
from dimo_tpu.models import gaussians as G
from dimo_tpu.train import optim
from dimo_tpu.train.step import LossConfig, TrainState, make_train_step
from dimo_tpu.utils import cameras

cfg, params, aux, _ = _flagship_scene()
res = 512
import os as _o
n_motions, n_views, n_frames = (int(x) for x in _o.environ.get("SHAPE","1,1,1").split(","))
B = n_motions*n_views*n_frames
rng = np.random.RandomState(0)
fov = float(np.deg2rad(33.9))
cams = cameras.stack_cameras([cameras.Camera.from_c2w(
    cameras.orbit_camera(0, 30. + 17 * i, 2.0), fov, fov) for i in range(B)])
mc = params.c_xyz.shape[0]
batch = {
    "camera": cams,
    "times": jnp.asarray(rng.rand(B), jnp.float32),
    "latent_idx": jnp.asarray(rng.randint(0, n_motions, B), jnp.int32),
    "mse_w": jnp.ones((B,), jnp.float32),
    "gt_image": jnp.asarray(rng.randint(0,255,(B,512,512,3),np.uint8)),
    "gt_mask": jnp.asarray(rng.randint(0,255,(B,512,512),np.uint8)),
    "guidance": jnp.zeros((B, mc, 3)),
}
lcfg = LossConfig(use_arap=False, add_depth=False, add_normal=False, add_ga=False)
step_fn = make_train_step(cfg, lcfg, "s2", res, res, n_motions, n_views, n_frames, capacity=1024)
loss_fn = step_fn.loss_fn

key = jax.random.PRNGKey(0)
taps = jnp.zeros((B, params.xyz.shape[0], 2))
step_c = jnp.asarray(1, jnp.int32)

def bench(f, *a, n=3, label=""):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    print(f"{label:42s} {(time.time()-t0)/n*1000:9.1f} ms", flush=True)

@jax.jit
def f_loss(p):
    l, _ = loss_fn(p, taps, aux, batch, key, step_c)
    return l
bench(f_loss, params, label="loss_fn fwd only")

@jax.jit
def f_grad0(p):
    return jax.grad(lambda pp: loss_fn(pp, taps, aux, batch, key, step_c)[0])(p)
bench(f_grad0, params, label="grad wrt params only")

@jax.jit
def f_grad01(p):
    g = jax.grad(lambda pp, tt: loss_fn(pp, tt, aux, batch, key, step_c)[0],
                 argnums=(0, 1))(p, taps)
    return g
bench(f_grad01, params, label="grad wrt (params, taps)")

state = TrainState(params=params, aux=aux, opt=optim.init(params),
                   step=jnp.zeros((), jnp.int32), rng=key)
bench(step_fn, state, batch, label="full train_step")

g = f_grad0(params)
print("grad |xyz| =", float(jnp.abs(g.xyz).sum()),
      "|timenet trunk0| =", float(jnp.abs(g.timenet["trunk_0_w"]).sum()), flush=True)

import time as _t
def evolving(n):
    s = state
    for _ in range(n):
        s, m = step_fn(s, batch)
    jax.block_until_ready(m["loss"])
    return m
m = evolving(1)  # warm + one update
t0 = _t.time(); m = evolving(5); dt = (_t.time()-t0)/5
print(f"evolving-state step: {dt*1000:.1f} ms  loss={float(m['loss']):.3f}", flush=True)

def fixed(n):
    for _ in range(n):
        s2, m2 = step_fn(state, batch)
    jax.block_until_ready(m2["loss"])
    return m2
t0 = _t.time(); m2 = fixed(5); dt = (_t.time()-t0)/5
print(f"fixed-state step:    {dt*1000:.1f} ms", flush=True)
