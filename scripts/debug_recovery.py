import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Ground-truth reachability + recovery test.

1) Render the TRUE synthetic scene params through the training path and
   PSNR against the stored GT (should be ~40+; the pipeline is the same).
2) Perturb params slightly, optimize ONLY MSE, confirm rapid recovery.
Failure isolates the bug: (1) fails -> data/convention mismatch;
(2) fails -> optimization/gradient bug.
"""
import numpy as np, jax, jax.numpy as jnp, random
from dimo_tpu.models import gaussians as G
from dimo_tpu.train import optim
from dimo_tpu.train.step import LossConfig, TrainState, make_train_step
from dimo_tpu.utils import cameras

REF = 128
N = 60
rng = np.random.RandomState(0)
means = rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32)
scales = np.full((N, 3), 0.06, np.float32)
quats = np.tile(np.array([1, 0, 0, 0], np.float32), (N, 1))
opac = np.full((N, 1), 0.95, np.float32)
sh = rng.uniform(-0.8, 0.8, (N, 1, 3)).astype(np.float32)

fov = float(np.deg2rad(33.9))
n_views = 8
azims = [360.0 / n_views * v for v in range(n_views)]
from dimo_tpu.ops.rasterizer import rasterize_dense
bg = jnp.ones(3)

@jax.jit
def gt_render(cam):
    return rasterize_dense(jnp.asarray(means), jnp.asarray(scales),
                           jnp.asarray(quats), jnp.asarray(opac),
                           jnp.asarray(sh), cam, REF, REF, bg).image

gt_imgs, gt_masks = [], []
for v in range(n_views):
    cam = cameras.Camera.from_c2w(cameras.orbit_camera(0, azims[v], 2.0), fov, fov)
    img = np.asarray(gt_render(cam))
    gt_imgs.append((np.clip(img.transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8))
    gt_masks.append(np.zeros((REF, REF), np.uint8))

# --- true params through the training-step render path
cfg = G.ModelConfig(sh_degree=0, latent_dim=16, num_latents=1,
                    capacity=64, cpt_capacity=8)
params, aux = G._blank(cfg)
import dimo_tpu.models.timenet as T
inv_sig = lambda x: np.log(x / (1 - x))
params = params.replace(
    xyz=jnp.asarray(means), features_dc=jnp.asarray(sh),
    scaling=jnp.asarray(np.log(scales)),
    rotation=jnp.asarray(quats),
    opacity=jnp.asarray(np.full((N, 1), inv_sig(0.95), np.float32)),
    r=jnp.asarray([[np.log(0.06)]], ).astype(jnp.float32),
    latent={"codes": jnp.zeros((1, 16))},
    timenet=T.init_timenet(jax.random.PRNGKey(1), 16))
pad = 64 - N
params = params.replace(
    xyz=jnp.concatenate([params.xyz, jnp.zeros((pad, 3))]),
    features_dc=jnp.concatenate([params.features_dc, jnp.zeros((pad, 1, 3))]),
    scaling=jnp.concatenate([params.scaling, jnp.full((pad, 3), -10.0)]),
    rotation=jnp.concatenate([params.rotation,
                              jnp.tile(jnp.asarray([[1., 0, 0, 0]]), (pad, 1))]),
    opacity=jnp.concatenate([params.opacity, jnp.full((pad, 1), -10.0)]))
params = optim.strongify(params)
aux = aux.replace(active=jnp.arange(64) < N)

lcfg = LossConfig(use_arap=False, add_depth=False, add_normal=False,
                  add_ga=False, lambda_ssim=0.0, lambda_mask=0.0,
                  position_lr_max_steps=500)
groups = frozenset({"xyz", "f_dc", "opacity", "r"})
step_fn = make_train_step(cfg, lcfg, "s1", REF, REF, 1, 4, 1,
                          capacity=64, trainable_groups=groups)

def make_batch(views):
    cams = cameras.stack_cameras([
        cameras.Camera.from_c2w(cameras.orbit_camera(0, azims[v], 2.0), fov, fov)
        for v in views])
    return {
        "camera": cams,
        "times": jnp.zeros((4,), jnp.float32),
        "latent_idx": jnp.zeros((4,), jnp.int32),
        "mse_w": jnp.ones((4,), jnp.float32),
        "gt_image": jnp.asarray(np.stack([gt_imgs[v] for v in views])),
        "gt_mask": jnp.asarray(np.stack([gt_masks[v] for v in views])),
        "guidance": jnp.zeros((4, 8, 3)),
    }

state = TrainState(params=params, aux=aux, opt=optim.init(params),
                   step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0))
_, m0 = step_fn(state, make_batch([0, 1, 2, 3]))
print(f"TRUE params psnr: {float(m0['psnr']):.2f}  (expect > 35)", flush=True)

# --- perturb and recover
key = jax.random.PRNGKey(7)
params_p = params.replace(
    xyz=params.xyz + 0.02 * jax.random.normal(key, params.xyz.shape))
params_p = optim.strongify(params_p)
state = TrainState(params=params_p, aux=aux, opt=optim.init(params_p),
                   step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0))
prng = random.Random(0)
for it in range(1, 201):
    views = prng.sample(range(n_views), 4)
    state, m = step_fn(state, make_batch(views))
    if it in (1, 25, 50, 100, 150, 200):
        print(f"it {it}: psnr={float(m['psnr']):6.2f} loss={float(m['loss']):9.2f}",
              flush=True)
