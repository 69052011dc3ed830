import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Static-scene fit sanity check: can the rasterizer+Adam fit a single
static multi-view scene? (No deformation training: deform/latent LRs zero.)"""
import numpy as np, jax, jax.numpy as jnp
from dimo_tpu.io.synthetic import make_synthetic_videos
from dimo_tpu.models import gaussians as G
from dimo_tpu.train import optim
from dimo_tpu.train.step import LossConfig, TrainState, make_train_step
from dimo_tpu.utils import cameras
import random

REF = 128
images, masks, meta = make_synthetic_videos(num_motions=1, num_views=8,
                                            num_frames=1, ref_size=REF,
                                            n_gauss=60, seed=0, fovy_deg=33.9)
cfg = G.ModelConfig(sh_degree=0, latent_dim=16, num_latents=1,
                    capacity=512, cpt_capacity=64)
params, aux = G.init_model(cfg, seed=0, num_pts=256, num_cpts=64)
params = optim.strongify(params)
state = TrainState(params=params, aux=aux, opt=optim.init(params),
                   step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0))

lcfg = LossConfig(use_arap=False, add_depth=False, add_normal=False,
                  add_ga=False, position_lr_max_steps=500)
groups = frozenset({"xyz", "f_dc", "f_rest", "opacity", "scaling",
                    "rotation", "r"})
res = 128
n_views = 4
step_fn = make_train_step(cfg, lcfg, "s1", res, res, 1, n_views, 1,
                          capacity=512, trainable_groups=groups)

fov = float(np.deg2rad(33.9))
rng = random.Random(0)
for it in range(1, 401):
    views = rng.sample(range(8), n_views)
    cams = cameras.stack_cameras([
        cameras.Camera.from_c2w(
            cameras.orbit_camera(0, meta["azimuths"][v], 2.0), fov, fov)
        for v in views])
    batch = {
        "camera": cams,
        "times": jnp.zeros((n_views,), jnp.float32),
        "latent_idx": jnp.zeros((n_views,), jnp.int32),
        "mse_w": jnp.ones((n_views,), jnp.float32),
        "gt_image": jnp.asarray(np.stack([images[0, v, 0] for v in views])),
        "gt_mask": jnp.asarray(np.stack([masks[0, v, 0] for v in views])),
        "guidance": jnp.zeros((n_views, 64, 3)),
    }
    state, m = step_fn(state, batch)
    if it % 25 == 0:
        print(f"it {it}: loss={float(m['loss']):9.1f} psnr={float(m['psnr']):6.2f} "
              f"mse={float(m['mse']):.4f} ssimL={float(m['ssim_loss']):.4f} "
              f"mask={float(m['mask_loss']):.4f} arap={float(m['arap']):.2f} "
              f"ga={float(m['ga']):.2f} smooth={float(m['smooth']):.3f} "
              f"bil={float(m['bilateral']):.3f}", flush=True)
