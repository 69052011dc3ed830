"""The jitted training step: batched renders, loss assembly, Adam update.

The reference's hot loop (`main_train_dimo.py:221-451`) renders up to
16 (motion, view, frame) jobs SERIALLY in Python, then backprops once. Here
the whole step is ONE jitted function: renders are vmapped over the batch
axis (the natural TPU parallel axis — see parallel/ for the sharded variant),
losses are assembled in-graph, gradients flow through the Pallas rasterizer
VJP, and the per-group Adam update runs on-device. Host sees only metrics.

Loss parity (`main_train_dimo.py:327-390`):
  * per-image weighted MSE (ref view/frame x1, others x0.5) * lambda_mse
  * per-motion LPIPS / SSIM / mask-MSE
  * VAE KL per motion
  * edge-aware depth + bilateral normal smoothness (step-gated)
  * ARAP on the deformed node graph (stage-gated)
  * chamfer guidance of cpts to cached stage-1 trajectories (s2)
Step-dependent gates are jnp.where weights so the step never recompiles.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from dimo_tpu.models import gaussians as G
from dimo_tpu.models import timenet as timenet_mod
from dimo_tpu.models.renderer import render, find_knn
from dimo_tpu.ops import arap as arap_mod
from dimo_tpu.ops import image_losses as L
from dimo_tpu.ops import neighbors
from dimo_tpu.train import optim
from dimo_tpu.utils import schedules

# Batched-render mapping strategy (chip probe scripts/probe_render_map.py,
# 2026-08-20, B=16 512^2 100k-gaussian fwd+bwd of the render):
#   vmap 1846 ms | lax.map seq 1202 ms | batch_size=4 1739 | batch_size=8 1580
# Sequential mapping wins 1.54x: each render's backward keeps a small
# working set (the vmapped bwd spills), and the binning big-path lax.cond
# stays a real branch instead of vmap's execute-both-branches select.
# DIMO_RENDER_CHUNK: 1 (default) = lax.map scan, one render per iteration;
# 0 = vmap (the pre-round-5 strategy); K>1 = lax.map batch_size=K.
RENDER_CHUNK = int(os.environ.get("DIMO_RENDER_CHUNK", "1"))


@struct.dataclass
class TrainState:
    params: G.GaussianParams
    aux: G.GaussianAux
    opt: optim.AdamState
    step: jnp.ndarray  # () int32, current stage-local step (1-based after update)
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static loss/schedule hyper-parameters (YAML keys preserved)."""
    lambda_mse: float = 5000.0
    lambda_lpips: float = 1000.0
    lambda_ssim: float = 500.0
    lambda_mask: float = 500.0
    lambda_smooth: float = 100.0
    lambda_bilateral: float = 0.05
    lambda_arap: float = 10.0
    lambda_kl: float = 0.05
    lambda_ga1: float = 10.0
    lambda_ga2: float = 10000.0
    # Global l2 grad clipping (0 = off, the reference-parity default).
    # Adam is ~scale-invariant to a uniform grad rescale, so clipping at a
    # generous threshold leaves healthy dynamics untouched while bounding
    # the damage of the s2 gradient explosions that overflowed Adam nu to
    # Inf in the 2026-08-20 scale512 runs (huge-but-FINITE grads pass an
    # isfinite guard; their squares do not fit in f32).
    grad_clip_norm: float = 0.0
    add_depth: bool = True
    add_normal: bool = True
    add_ga: bool = True
    ga_chamfer: bool = True
    use_arap: bool = True
    vae: bool = False
    depth_reg_start_iter: int = 200
    normal_reg_start_iter: int = 200
    arap_start_iter_s1: int = 1000
    arap_end_iter_s2: int = 2000
    # densification stats window (reference `main_train_dimo.py:427`)
    fps_iter: int = 1000
    density_start_iter: int = 100
    density_end_iter: int = 1000
    # optimizer schedule params
    position_lr_init: float = 0.01
    position_lr_final: float = 0.0002
    position_lr_max_steps: int = 500
    c_position_lr_init: float = 0.000002
    c_position_lr_final: float = 0.000002
    latent_code_lr_init: float = 0.005
    latent_code_lr_final: float = 0.0002
    deform_lr_init: float = 0.0002
    deform_lr_final: float = 0.000002
    feature_lr: float = 0.01
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.005
    c_radius_lr: float = 0.005
    r_lr: float = 0.01
    arap_t_samples: int = 8
    arap_radius: float = 0.1


def group_lrs(lcfg: LossConfig, step, stage: str,
              trainable_groups: frozenset | None = None):
    """Per-group LR dict at `step` — reference update_learning_rate semantics
    (`latent_gs_renderer.py:497-515` + driver overrides at
    `main_train_dimo.py:251-254,464-469` and `prepare_train_s2:471-500`)."""
    xyz_sched = schedules.expon_lr(lcfg.position_lr_init, lcfg.position_lr_final,
                                   max_steps=lcfg.position_lr_max_steps)
    c_sched = schedules.expon_lr(lcfg.c_position_lr_init, lcfg.c_position_lr_final,
                                 max_steps=lcfg.position_lr_max_steps)
    lat_sched = schedules.expon_lr(lcfg.latent_code_lr_init, lcfg.latent_code_lr_final,
                                   max_steps=lcfg.position_lr_max_steps)
    def_sched = schedules.expon_lr(lcfg.deform_lr_init, lcfg.deform_lr_final,
                                   max_steps=lcfg.position_lr_max_steps)
    z = jnp.zeros(())
    if stage == "s1":
        lrs = {
            "xyz": xyz_sched(step),
            "f_dc": lcfg.feature_lr, "f_rest": lcfg.feature_lr / 20.0,
            "opacity": lcfg.opacity_lr, "scaling": lcfg.scaling_lr,
            "rotation": lcfg.rotation_lr,
            "latent_code": lcfg.latent_code_lr_init,
            "latent_code_mu": lcfg.latent_code_lr_init,
            "latent_code_log_var": lcfg.latent_code_lr_init,
            "deform": lcfg.deform_lr_init, "deform_rot": lcfg.deform_lr_init,
            "c_xyz": z, "c_radius": z, "r": lcfg.r_lr,
        }
    else:
        xyz_lr = jnp.where(step < 1000, 0.0002, xyz_sched(step))
        lrs = {
            "xyz": xyz_lr,
            "f_dc": lcfg.feature_lr, "f_rest": lcfg.feature_lr / 20.0,
            "opacity": lcfg.opacity_lr, "scaling": lcfg.scaling_lr,
            "rotation": lcfg.rotation_lr,
            "latent_code": lat_sched(step),
            "latent_code_mu": lat_sched(step),
            "latent_code_log_var": lat_sched(step),
            "deform": def_sched(step), "deform_rot": def_sched(step),
            "c_xyz": c_sched(step), "c_radius": lcfg.c_radius_lr, "r": z,
        }
    if trainable_groups is not None:
        # test-time finetuning: zero every group not in the set, and drive
        # latent groups by the latent scheduler (reference prepare_ft_latent +
        # finetune_latent, `main_test_dimo.py:895-925`)
        latents = {"latent_code", "latent_code_mu", "latent_code_log_var"}
        lrs = {k: ((lat_sched(step) if k in latents else lrs[k])
                   if k in trainable_groups else z) for k in lrs}
    return lrs


def make_train_step(
    cfg: G.ModelConfig,
    lcfg: LossConfig,
    stage: str,
    width: int,
    height: int,
    n_motions: int,
    n_views: int,
    n_frames: int,
    capacity: int = 512,
    use_oracle: bool = False,
    lpips_fn: Callable | None = None,
    use_guidance: bool = False,
    trainable_groups: frozenset | None = None,
) -> Callable:
    """Build the jitted step for a fixed (stage, resolution, batch shape).

    Batch dict (device arrays; leading axis B = n_motions*n_views*n_frames,
    ordered motion-major then view then frame):
      cam_*: stacked Camera fields (B, ...)
      times (B,), latent_idx (B,) int32, mse_w (B,) per-image MSE weight
      gt_image (B, 3, H, W) at render res; gt_mask (B, 1, H, W)
      guidance (n_motions*n_frames... flattened per-render) (B, M, 3) cached
        s1 cpts trajectories (s2 only; zeros otherwise)
    """
    B = n_motions * n_views * n_frames
    bg = jnp.ones((3,))

    # exposed for profiling/bisection (scripts/profile_train.py)
    def loss_fn(params, taps, aux, batch, rng, step):
        cams = batch["camera"]
        rngs = jax.random.split(rng, B + n_motions)
        render_rngs = rngs[:B] if lcfg.vae else [None] * B
        arap_rng = rngs[B]

        knn_cache = find_knn(params, aux) if stage >= "s2" else None

        def one(cam, t, li, tap, krng):
            return render(cfg, params, aux, cam, t, stage, li, width, height,
                          bg, rng=krng, knn_cache=knn_cache, capacity=capacity,
                          mean2d_tap=tap, use_oracle=use_oracle)

        if lcfg.vae:
            xs = (cams, batch["times"], batch["latent_idx"], taps,
                  jnp.stack(render_rngs))
            fn = one
        else:
            xs = (cams, batch["times"], batch["latent_idx"], taps)
            fn = lambda cam, t, li, tap: one(cam, t, li, tap, None)  # noqa: E731
        if RENDER_CHUNK == 0:
            outs = jax.vmap(fn)(*xs)
        else:
            outs = jax.lax.map(
                lambda a: fn(*a), xs,
                batch_size=RENDER_CHUNK if RENDER_CHUNK > 1 else None)

        imgs = outs["image"]                                  # (B, 3, h, w)
        masks = outs["alpha"]
        # GT arrives uint8 at ref_size; convert+bilinear-resize on device
        # (reference F.interpolate align_corners=False ~ jax half-pixel
        # linear). Same-size resize is skipped: jax.image.resize emits the
        # full interpolation graph even at scale 1.
        gt_full = batch["gt_image"].astype(jnp.float32) / 255.0   # (B,S,S,3)
        if gt_full.shape[1:3] != (height, width):
            gt_full = jax.image.resize(
                gt_full, (B, height, width, 3), "linear")
        gt = jnp.transpose(gt_full, (0, 3, 1, 2))
        gt_m = batch["gt_mask"].astype(jnp.float32) / 255.0       # (B,S,S)
        if gt_m.shape[1:3] != (height, width):
            gt_m = jax.image.resize(gt_m, (B, height, width), "linear")
        gt_m = gt_m[:, None]

        # --- weighted per-image MSE
        per_img_mse = jnp.mean((imgs - gt) ** 2, axis=(1, 2, 3))    # (B,)
        mse_term = lcfg.lambda_mse * jnp.sum(batch["mse_w"] * per_img_mse)

        # --- per-motion SSIM / LPIPS / mask (motion-major batch layout)
        def per_motion(x):
            return x.reshape(n_motions, n_views * n_frames, *x.shape[1:])

        imgs_m = per_motion(imgs)
        gt_m_imgs = per_motion(gt)
        ssim_losses = jax.vmap(
            lambda a, b: 1.0 - L.ssim(jnp.transpose(a, (0, 2, 3, 1)),
                                      jnp.transpose(b, (0, 2, 3, 1))))(
            imgs_m, gt_m_imgs)                                # (n_motions,)
        ssim_term = lcfg.lambda_ssim * jnp.sum(ssim_losses)

        if lpips_fn is not None:
            # SEQUENTIAL + rematerialized over motions: B simultaneous
            # 512^2 VGG towers (vmap) OOM HBM at reference scale (16.5G >
            # 15.75G, first s2 step); lax.map + jax.checkpoint keeps one
            # motion's tower activations live at a time, and a 512^2 VGG
            # saturates the MXU anyway so serializing costs ~nothing.
            lp = jax.lax.map(
                lambda ab: jnp.mean(jax.checkpoint(lpips_fn)(ab[0], ab[1])),
                (imgs_m, gt_m_imgs))
            lpips_term = lcfg.lambda_lpips * jnp.sum(lp)
        else:
            lp = jnp.zeros((n_motions,))
            lpips_term = 0.0

        mask_losses = jax.vmap(lambda a, b: jnp.mean((a - b) ** 2))(
            per_motion(masks), per_motion(gt_m))
        mask_term = lcfg.lambda_mask * jnp.sum(mask_losses)

        loss = mse_term + ssim_term + lpips_term + mask_term

        # --- VAE KL per motion
        kl = jnp.zeros(())
        if lcfg.vae:
            m_idx = batch["latent_idx"].reshape(
                n_motions, n_views * n_frames)[:, 0]
            mu = params.latent["mu"][m_idx]
            log_var = params.latent["log_var"][m_idx]
            kl = jnp.sum(-0.5 * jnp.sum(
                1 + log_var - mu ** 2 - jnp.exp(log_var), axis=-1))
            loss = loss + lcfg.lambda_kl * kl

        # --- depth / normal regularizers (step gates as weights)
        depth_gate = (step > lcfg.depth_reg_start_iter).astype(jnp.float32)
        normal_gate = (step > lcfg.normal_reg_start_iter).astype(jnp.float32)
        smooth_l = jnp.zeros(())
        if lcfg.add_depth:
            d_nhwc = jnp.transpose(outs["depth"], (0, 2, 3, 1))
            i_nhwc = jnp.transpose(imgs, (0, 2, 3, 1))
            dd = jax.vmap(L.edge_aware_smoothness)(
                per_motion(d_nhwc), per_motion(i_nhwc))
            smooth_l = jnp.sum(dd)
            loss = loss + depth_gate * lcfg.lambda_smooth * smooth_l
        bilat_l = jnp.zeros(())
        if lcfg.add_normal:
            n_nhwc = jnp.transpose(outs["normal"], (0, 2, 3, 1))
            i_nhwc = jnp.transpose(imgs, (0, 2, 3, 1))
            bb = jax.vmap(L.bilateral_normal_smoothness)(
                per_motion(n_nhwc), per_motion(i_nhwc))
            bilat_l = jnp.sum(bb)
            loss = loss + normal_gate * lcfg.lambda_bilateral * bilat_l

        # --- ARAP per motion in batch
        arap_l = jnp.zeros(())
        if lcfg.use_arap and trainable_groups is None:
            if stage == "s1":
                arap_gate = (step > lcfg.arap_start_iter_s1).astype(jnp.float32)
                base = params.xyz
                node_valid = aux.active
            else:
                arap_gate = (step < lcfg.arap_end_iter_s2).astype(jnp.float32)
                base = params.c_xyz
                node_valid = aux.c_active
            m_idx = batch["latent_idx"].reshape(
                n_motions, n_views * n_frames)[:, 0]
            q_times = jax.random.uniform(arap_rng, (lcfg.arap_t_samples,))
            node_rngs = jax.random.split(arap_rng, n_motions)

            def arap_for_motion(li, nrng):
                lat = G.sample_latent(params, li, None)
                d_xyz_t, _ = jax.vmap(
                    lambda t: timenet_mod.apply_timenet(
                        params.timenet, base, t, lat))(q_times)
                return arap_mod.arap_loss(base, d_xyz_t, valid=node_valid,
                                          radius=lcfg.arap_radius, rng=nrng)

            arap_l = jnp.sum(jax.vmap(arap_for_motion)(m_idx, node_rngs))
            loss = loss + arap_gate * lcfg.lambda_arap * arap_l

        # --- stage-1 trajectory guidance (s2)
        ga_l = jnp.zeros(())
        if use_guidance and stage >= "s2" and lcfg.add_ga:
            cpts_t = outs["cpts_t"]                          # (B, M, 3)
            guid = batch["guidance"]                          # (B, M, 3)
            c_valid = aux.c_active

            def one_ga(c, g):
                if lcfg.ga_chamfer:
                    return neighbors.chamfer_forward(c, g, x_valid=c_valid)
                diff = jnp.where(c_valid[:, None], jnp.abs(c - g), 0.0)
                return jnp.sum(diff) / jnp.maximum(
                    jnp.sum(c_valid) * 3.0, 1.0)

            ga_each = jax.vmap(one_ga)(cpts_t, jax.lax.stop_gradient(guid))
            ga_l = jnp.sum(ga_each)
            lam = lcfg.lambda_ga1 if lcfg.ga_chamfer else lcfg.lambda_ga2
            loss = loss + lam * ga_l

        metrics = {
            "loss": loss,
            "mse": jnp.mean(per_img_mse),
            "psnr": L.psnr(jnp.mean(per_img_mse)),
            "ssim_loss": jnp.mean(ssim_losses),
            "lpips": jnp.mean(lp),
            "mask_loss": jnp.mean(mask_losses),
            "kl": kl,
            "arap": arap_l,
            "ga": ga_l,
            "smooth": smooth_l,
            "bilateral": bilat_l,
            "overflow": jnp.sum(outs["overflow"]),
            "overflow_max": jnp.max(outs["overflow_max"]),
        }
        vis_aux = {
            "radii": outs["radii"][-1],
            "visibility": outs["visibility_filter"][-1],
            "debug_render": imgs[0],
            "debug_gt": gt[0],
        }
        return loss, (metrics, vis_aux)

    @jax.jit
    def train_step(state: TrainState, batch: dict):
        rng, sub = jax.random.split(state.rng)
        step = state.step + 1
        n = state.params.xyz.shape[0]
        taps = jnp.zeros((B, n, 2))

        grad_fn = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)
        (gparams, gtaps), (metrics, vis_aux) = grad_fn(
            state.params, taps, state.aux, batch, sub, step)

        lrs = group_lrs(lcfg, step, stage,
                        trainable_groups=trainable_groups)
        lr_tree = optim.build_lr_tree(state.params, lrs)

        # Non-finite/overflow gradient guard: one inf/nan leaf would
        # poison the Adam moments and every subsequent step (the
        # 2026-08-20 scale512 run diverged to 100% NaN params this way).
        # A step whose grads are not fully finite — or so large that
        # g*g would overflow nu to Inf (|g| > ~1.8e19 in f32; guarded at
        # 1e17) — is SKIPPED: params and moments untouched, surfaced as
        # metrics["nonfinite_grad"]. Costs one |g| pass over the grads
        # (~free next to the render backward).
        sup_g = jax.tree_util.tree_reduce(
            lambda acc, g: jnp.maximum(
                acc, jnp.max(jnp.abs(g), initial=0.0)),  # initial: empty
            gparams, jnp.float32(0.0))                   # leaves (deg-0 SH)
        grads_ok = jax.tree_util.tree_reduce(
            lambda acc, g: acc & jnp.all(jnp.isfinite(g)),
            gparams, jnp.bool_(True)) & (sup_g < 1e17)

        # Optional global-norm clipping (torch clip_grad_norm_ analog;
        # lcfg.grad_clip_norm <= 0 disables — the parity default).
        gnorm = jnp.sqrt(jax.tree_util.tree_reduce(
            lambda acc, g: acc + jnp.sum(jnp.square(g).astype(jnp.float32)),
            gparams, jnp.float32(0.0)))
        if lcfg.grad_clip_norm > 0:
            scale = jnp.minimum(1.0, lcfg.grad_clip_norm / (gnorm + 1e-12))
            gparams = jax.tree.map(lambda g: g * scale, gparams)
        gparams = jax.tree.map(
            lambda g: jnp.where(grads_ok, g, jnp.zeros_like(g)), gparams)
        upd_params, upd_opt = optim.update(state.params, gparams, state.opt,
                                           lr_tree)
        new_params, new_opt = jax.tree.map(
            lambda new, old: jnp.where(grads_ok, new, old),
            (upd_params, upd_opt), (state.params, state.opt))

        # densification statistics from the LAST render in the batch
        # (reference: out of the python loop, `main_train_dimo.py:429-431`),
        # accumulated ONLY inside the densify window the prune consumes
        # (`main_train_dimo.py:427`: step % FPS_iter >= density_start_iter
        # and step <= density_end_iter)
        new_aux = state.aux
        if stage == "s1":
            upd = G.update_max_radii(new_aux, vis_aux["radii"],
                                     vis_aux["visibility"])
            upd = G.add_densification_stats(upd, gtaps[-1],
                                            vis_aux["visibility"])
            in_window = ((step % lcfg.fps_iter >= lcfg.density_start_iter)
                         & (step <= lcfg.density_end_iter))
            new_aux = jax.tree.map(
                lambda a, b: jnp.where(in_window, a, b), upd, new_aux)

        new_state = TrainState(params=new_params, aux=new_aux, opt=new_opt,
                               step=step, rng=rng)
        metrics = dict(metrics)
        metrics["nonfinite_grad"] = (~grads_ok).astype(jnp.int32)
        metrics["grad_norm"] = gnorm
        metrics["grad_sup"] = sup_g
        metrics["debug_render"] = vis_aux["debug_render"]
        metrics["debug_gt"] = vis_aux["debug_gt"]
        return new_state, metrics

    train_step.loss_fn = loss_fn
    return train_step
