"""Host-side training orchestration: stages, batching, densify cadence, IO.

Functional equivalent of the reference driver class `GUI`
(`main_train_dimo.py:39-529`): stage-1 motion pretraining then stage-2 joint
refinement, with the same batch sampling, resolution schedule, densify/prune
cadence, FPS anneal, checkpoint layout and TensorBoard metric names. The
device never sees Python control flow — the loop only assembles batches,
invokes jitted functions, and handles capacity/stage transitions.
"""
from __future__ import annotations

import os
import random
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from dimo_tpu.io import checkpoint as ckpt_io
from dimo_tpu.io import ply as ply_io
from dimo_tpu.models import gaussians as G
from dimo_tpu.models import timenet as timenet_mod
from dimo_tpu.train import optim
from dimo_tpu.train.step import LossConfig, TrainState, make_train_step
from dimo_tpu.utils import cameras


def loss_config_from_opt(opt, stage: str) -> LossConfig:
    """Build a LossConfig from an OmegaConf-style dict, applying the
    reference's per-stage schedule rewrites (`prepare_train_s1/s2`)."""
    if stage == "s1":
        pos_init, pos_final, pos_max = opt.position_lr_init, opt.position_lr_final, 500
    else:
        pos_init, pos_final, pos_max = 0.0002, 0.000002, int(opt.iters_s2)
    return LossConfig(
        lambda_mse=opt.lambda_mse, lambda_lpips=opt.lambda_lpips,
        lambda_ssim=opt.lambda_ssim, lambda_mask=opt.lambda_mask,
        lambda_smooth=opt.lambda_smooth, lambda_bilateral=opt.lambda_bilateral,
        lambda_arap=opt.lambda_arap, lambda_kl=opt.lambda_kl,
        lambda_ga1=opt.lambda_ga1, lambda_ga2=opt.lambda_ga2,
        add_depth=opt.add_depth, add_normal=opt.add_normal,
        add_ga=opt.add_ga, ga_chamfer=opt.ga_chamfer, use_arap=opt.use_arap,
        vae=opt.vae_latent,
        depth_reg_start_iter=opt.depth_reg_start_iter,
        normal_reg_start_iter=opt.normal_reg_start_iter,
        arap_start_iter_s1=opt.arap_start_iter_s1,
        arap_end_iter_s2=opt.arap_end_iter_s2,
        fps_iter=int(opt.FPS_iter),
        density_start_iter=int(opt.density_start_iter),
        density_end_iter=int(opt.density_end_iter),
        position_lr_init=pos_init, position_lr_final=pos_final,
        position_lr_max_steps=pos_max,
        c_position_lr_init=opt.c_position_lr_init,
        c_position_lr_final=opt.c_position_lr_final,
        latent_code_lr_init=opt.latent_code_lr_init,
        latent_code_lr_final=opt.latent_code_lr_final,
        deform_lr_init=opt.deform_lr_init, deform_lr_final=opt.deform_lr_final,
        feature_lr=opt.feature_lr, opacity_lr=opt.opacity_lr,
        scaling_lr=opt.scaling_lr, rotation_lr=opt.rotation_lr,
        c_radius_lr=opt.c_radius_lr, r_lr=opt.r_lr,
        grad_clip_norm=float(opt.get("grad_clip_norm", 0.0)),
    )


def render_resolution_for_step(step: int) -> int:
    """128 -> 256 -> 512 at steps 300/450 (`main_train_dimo.py:263`)."""
    return 128 if step < 300 else (256 if step < 450 else 512)


class Trainer:
    """Owns data, model state, and the stage loops."""

    def __init__(self, opt, images: np.ndarray, masks: np.ndarray, meta: dict,
                 log_fn=None):
        """images: uint8 (M, V, F, S, S, 3); masks: uint8 (M, V, F, S, S).
        meta: azimuths / elevations / input_videos (io.dataset.load_info)."""
        self.opt = opt
        self.images = images
        self.masks = masks
        self.meta = meta
        self.input_videos = meta["input_videos"]
        self.azimuths = meta["azimuths"]
        self.num_motions = len(self.input_videos)
        self.num_views = int(opt.get("num_views", 9))
        self.num_frames = int(opt.get("num_frames", 21))
        self.log_fn = log_fn or (lambda *a, **k: None)

        self.fovy = np.deg2rad(opt.fovy)
        oc = cameras.OrbitCamera(opt.W, opt.H, r=opt.radius, fovy=opt.fovy)
        self.fovx = oc.fovx
        self.cam_near, self.cam_far = oc.near, oc.far

        self.seed = int(opt.seed) if str(opt.seed).isdigit() else 0
        random.seed(self.seed)
        np.random.seed(self.seed)
        self.py_rng = random.Random(self.seed)

        self.stage = "s1"
        self.step = 0
        self.cpts_s1 = None            # (M, F, Mc, 3) cached guidance
        self._step_fns = {}
        self._densify_fns = {}
        self._pending_meta = None      # prefetched batch meta (packer path)
        self._packer = None
        self._packer_b = None
        self._packer_pending = None
        # Device-resident dataset cache: when the whole (frames, S, S, 3)
        # uint8 video set fits comfortably in HBM, upload it ONCE and
        # gather each batch on-device — the per-step host->device gt
        # upload (17 MB/step at the reference shape) disappears entirely.
        # That upload is ~2 ms on PCIe hosts but DOMINATES through a
        # degraded tunnel (observed 2026-08-20: tunnel at ~1 MB/s turned
        # 1.3 s/step of upload into ~17 s/step). DIMO_DEVICE_DATA: auto
        # (default, on when <= 2 GB), 1 force on, 0 force off.
        self._dev_images = self._dev_masks = None
        self._dev_cpts = None
        dd = os.environ.get("DIMO_DEVICE_DATA", "auto")
        total_bytes = self.images.nbytes + self.masks.nbytes
        if dd != "0" and (dd == "1" or total_bytes <= 2 << 30):
            try:
                self._dev_images = jnp.asarray(
                    self.images.reshape((-1,) + self.images.shape[3:]))
                self._dev_masks = jnp.asarray(
                    self.masks.reshape((-1,) + self.masks.shape[3:]))
            except Exception as e:  # OOM etc: fall back to host batching
                print(f"[trainer] device data cache unavailable ({e!r}); "
                      "using host batch assembly")
                self._dev_images = self._dev_masks = None
        self.tile_capacity = int(opt.get("tile_capacity", 512))
        self._overflow_strikes = 0

        # data-parallel mesh (SURVEY section 2.3 obligation): batch sharded
        # over a "data" axis, params replicated, grad psum inserted by XLA.
        # data_parallel=N is a pure flag change — the step function is
        # unchanged, only placements differ.
        self.mesh = None
        dp = int(opt.get("data_parallel", 1) or 1)
        if dp > 1:
            from dimo_tpu.parallel import mesh as mesh_mod
            n_dev = len(jax.devices())
            if n_dev < dp:
                raise ValueError(
                    f"data_parallel={dp} but only {n_dev} devices visible")
            self._mesh_mod = mesh_mod
            self.mesh = mesh_mod.make_mesh(dp)

        cap_s1 = int(opt.get("capacity_s1", 8192))
        self.mcfg = G.ModelConfig(
            sh_degree=opt.sh_degree, latent_dim=opt.latent_code_dim,
            num_latents=self.num_motions, vae=bool(opt.vae_latent),
            capacity=cap_s1, cpt_capacity=int(opt.num_cpts),
            percent_dense=opt.percent_dense)
        params, aux = G.init_model(self.mcfg, seed=self.seed,
                                   num_pts=int(opt.num_cpts),
                                   num_cpts=int(opt.num_cpts))
        self.state = TrainState(
            params=optim.strongify(params), aux=aux,
            opt=optim.init(optim.strongify(params)),
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(self.seed))
        self._replicate_state()

    def _replicate_state(self):
        if self.mesh is not None:
            self.state = self._mesh_mod.replicate(self.state, self.mesh)

    # ------------------------------------------------------------------
    # batching

    def camera_for(self, azimuth: float) -> cameras.Camera:
        pose = cameras.orbit_camera(self.opt.elevation, azimuth, self.opt.radius)
        return cameras.Camera.from_c2w(pose, self.fovx, self.fovy,
                                       self.cam_near, self.cam_far)

    def _sample_meta(self):
        """Draw one batch's (motion, view, frame) tuples + host-cheap fields
        (reference sampling, `main_train_dimo.py:266-270`: batch_size frames
        x batch_size views x min(2*batch_size, M) motions)."""
        bs = int(self.opt.batch_size)
        frames = self.py_rng.sample(range(self.num_frames), min(bs, self.num_frames))
        views = self.py_rng.sample(range(self.num_views), min(bs, self.num_views))
        n_sel = min(2 * bs, self.num_motions)
        motions = np.random.choice(self.num_motions, n_sel, replace=False)

        cams, times, lat_idx, mse_w, mvf = [], [], [], [], []
        for m in motions:
            for v in views:
                for f in frames:
                    cams.append(self.camera_for(self.azimuths[v]))
                    times.append(f / self.num_frames)
                    lat_idx.append(m)
                    mse_w.append(1.0 if (v == 0 or f == 0) else 0.5)
                    mvf.append((m, v, f))
        mvf = np.asarray(mvf, np.int64)
        flat = (mvf[:, 0] * self.num_views + mvf[:, 1]) * self.num_frames \
            + mvf[:, 2]
        return {
            "cams": cams, "times": times, "lat_idx": lat_idx, "mse_w": mse_w,
            "mvf": mvf, "flat": flat,
            "shape": (n_sel, len(views), len(frames)),
        }

    def _get_packer(self, batch_size: int):
        """Native double-buffered frame packer, or None (numpy fallback)."""
        if getattr(self, "_packer_b", None) == batch_size:
            return self._packer
        old = getattr(self, "_packer", None)
        if old is not None:
            old.close()  # release the native handle + worker thread
        from dimo_tpu.io import native as native_io
        try:
            flat_imgs = self.images.reshape((-1,) + self.images.shape[3:])
            flat_msks = self.masks.reshape((-1,) + self.masks.shape[3:])
            self._packer = native_io.BatchPacker(flat_imgs, flat_msks,
                                                 batch_size, slots=2)
        except Exception as e:
            if not getattr(self, "_packer_warned", False):
                print(f"[trainer] native BatchPacker unavailable ({e!r}); "
                      "using numpy batch gathering")
                self._packer_warned = True
            self._packer = None
        self._packer_b = batch_size
        self._packer_pending = None
        return self._packer

    def sample_batch(self):
        """Assemble one device batch. Frame gathering goes through the native
        async BatchPacker when built (submit step k+1 while the device runs
        step k); otherwise one numpy fancy-index gather — never a Python
        per-frame copy loop."""
        meta = self._pending_meta or self._sample_meta()
        self._pending_meta = None
        b = len(meta["times"])

        if self._dev_images is not None:
            # device-resident path: an on-device row gather replaces the
            # per-step host upload (see __init__; ~18 ns/row XLA gather)
            flat = jnp.asarray(meta["flat"], jnp.int32)
            gt_i = self._dev_images[flat]
            gt_m = self._dev_masks[flat]
            return self._finish_batch(meta, gt_i, gt_m)
        packer = self._get_packer(b)

        if packer is not None:
            if self._packer_pending is None:        # first use: pack this one
                packer.submit(meta["flat"])
            gt_i, gt_m = packer.get()
            # prefetch the NEXT batch onto the worker thread before the
            # device sees this one (double-buffered slots: safe to overwrite
            # the other slot while this one uploads)
            self._pending_meta = self._sample_meta()
            if len(self._pending_meta["times"]) == b:
                packer.submit(self._pending_meta["flat"])
                self._packer_pending = True
            else:
                self._packer_pending = None
        else:
            flat_imgs = self.images.reshape((-1,) + self.images.shape[3:])
            flat_msks = self.masks.reshape((-1,) + self.masks.shape[3:])
            gt_i = flat_imgs[meta["flat"]]
            gt_m = flat_msks[meta["flat"]]
        return self._finish_batch(meta, gt_i, gt_m)

    def _finish_batch(self, meta, gt_i, gt_m):
        b = len(meta["times"])
        batch = {
            "camera": cameras.stack_cameras(meta["cams"]),
            "times": jnp.asarray(meta["times"], jnp.float32),
            "latent_idx": jnp.asarray(meta["lat_idx"], jnp.int32),
            "mse_w": jnp.asarray(meta["mse_w"], jnp.float32),
            "gt_image": jnp.asarray(gt_i),
            "gt_mask": jnp.asarray(gt_m),
        }
        if self.cpts_s1 is not None:
            if self._dev_images is not None:
                # guidance cached on device alongside the dataset (its
                # ~0.7 MB/step upload also dies with a degraded tunnel)
                if self._dev_cpts is None:
                    self._dev_cpts = jnp.asarray(self.cpts_s1)
                batch["guidance"] = self._dev_cpts[
                    jnp.asarray(meta["mvf"][:, 0]),
                    jnp.asarray(meta["mvf"][:, 2])]
            else:
                batch["guidance"] = jnp.asarray(
                    self.cpts_s1[meta["mvf"][:, 0], meta["mvf"][:, 2]])
        else:
            mc = self.state.params.c_xyz.shape[0]
            batch["guidance"] = jnp.zeros((b, mc, 3))
        return batch, meta["shape"]

    # ------------------------------------------------------------------
    # step functions (cached per (stage, resolution, batch shape))

    def get_step_fn(self, stage, res, shape, lpips_fn=None):
        key = (stage, res, shape, self.tile_capacity)
        if key not in self._step_fns:
            lcfg = loss_config_from_opt(self.opt, stage)
            n_motions, n_views, n_frames = shape
            self._step_fns[key] = make_train_step(
                self.mcfg, lcfg, stage, res, res,
                n_motions, n_views, n_frames,
                capacity=self.tile_capacity,
                lpips_fn=lpips_fn,
                use_guidance=(stage >= "s2"))
        return self._step_fns[key]

    def _check_overflow(self, metrics):
        """Adaptive tile-capacity escalation: the CUDA binning has no
        capacity cliff (`renderer/latent_gs_renderer.py:1268`); ours reports
        dropped entries, and persistent heavy overflow doubles the capacity
        (one re-jit) instead of silently truncating for the rest of the run.
        Checked every 10 steps to avoid a per-step host sync."""
        if self.step % 10 != 0:
            return
        # Default ceiling 4096: the round-2 device fault at 4096 was specific
        # to the tile compositor's capacity-scaled in-kernel buffers; the
        # strip compositor streams capacity as a GRID dimension (slabs arrive
        # in (1, G, 16) HBM blocks, scratch is capacity-invariant ~1MB), so
        # escalation no longer changes the kernel's VMEM footprint. The knob
        # remains for emergency clamping.
        cap_max = int(self.opt.get("tile_capacity_max", 4096))
        if self.tile_capacity >= cap_max:
            return
        ov = float(metrics["overflow"])
        ovm = float(metrics.get("overflow_max", 0.0))
        b = self._last_b
        # sustained heavy truncation: EITHER one strip drops >25% of its
        # capacity (overflow_max — catches truncation concentrated in a
        # single silhouette-dense strip, which the batch-total proxy
        # dilutes), OR total drops per render exceed 25% of one strip's
        # capacity (the original diffuse-drop proxy)
        if ovm > 0.25 * self.tile_capacity or ov / b > 0.25 * self.tile_capacity:
            self._overflow_strikes += 1
        else:
            self._overflow_strikes = 0
        if self._overflow_strikes >= 3:
            self.tile_capacity = min(self.tile_capacity * 2, cap_max)
            self._overflow_strikes = 0
            print(f"[capacity] tile overflow sustained; tile_capacity -> "
                  f"{self.tile_capacity}")

    # ------------------------------------------------------------------
    # training

    def train_dynamic(self, iters_s1: int, iters_s2: int, load_stage: str = "",
                      lpips_fn=None, snapshot_every: int = 0,
                      snapshot_dir: str = ""):
        """Two-stage schedule. snapshot_every/snapshot_dir enable ELASTIC
        resume for long runs (hours-scale jobs surviving device/tunnel
        failures): every N steps the full TrainState (incl. Adam moments and
        cached s1 trajectories) is written atomically, and re-invoking the
        same train_dynamic continues from the last snapshot (host batch RNG
        is reseeded, so the batch sequence after resume differs from an
        uninterrupted run — elastic, not bit-exact). The reference has no
        mid-run recovery (`main_train_dimo.py` restarts stages from zero)."""
        if load_stage >= "s1":
            iters_s1 = 0
        if load_stage >= "s2":
            iters_s2 = 0
        if load_stage:
            self.load_checkpoint(load_stage)

        # an explicit load_stage request overrides a snapshot of the SAME
        # or EARLIER phase (the user asked to (re)start from that stage
        # checkpoint, not to continue a previous run) — but a snapshot of
        # a LATER phase is this run's own elastic progress past the loaded
        # stage (e.g. load_stage="s1" to skip stage 1, then resume the s2
        # snapshots across relaunches) and wins
        snap = bool(snapshot_every and snapshot_dir)
        start_s1 = start_s2 = 0
        s2_prepared = False
        if snap:
            # peek at the phase BEFORE load_snapshot (which mutates state):
            # a discarded snapshot must not clobber the load_checkpoint above
            peek = self.peek_snapshot_phase(snapshot_dir)
            use = peek is not None and (not load_stage or peek > load_stage)
            meta = self.load_snapshot(snapshot_dir) if use else None
            if meta is not None:
                if meta["phase"] == "s1":
                    start_s1 = meta["done"]
                else:
                    start_s1 = iters_s1
                    start_s2 = meta["done"]
                    s2_prepared = True   # snapshot state is post-prepare
                print(f"[snapshot] resumed {meta['phase']} after "
                      f"{meta['done']} iters (step {self.step})")

        if iters_s1 > 0 and not s2_prepared:
            if start_s1 == 0:
                self.prepare_train_s1()
            # min(): a snapshot beyond a REDUCED iters_s1 still runs
            # finish_s1 (prune + checkpoint) instead of skipping the stage
            for i in range(min(start_s1, iters_s1), iters_s1):
                self.train_step_once(lpips_fn)
                if snap and (i + 1) % snapshot_every == 0 and i + 1 < iters_s1:
                    self.save_snapshot(snapshot_dir, "s1", i + 1)
            self.finish_s1()

        if iters_s2 > 0:
            if not s2_prepared:
                self.prepare_train_s2()
                if snap:
                    # stage-transition snapshot: a failure early in s2 must
                    # not redo s1 (prepare_train_s2 rebuilt state/capacity)
                    self.save_snapshot(snapshot_dir, "s2", 0)
            for i in range(min(start_s2, iters_s2), iters_s2):
                self.train_step_once(lpips_fn)
                if snap and (i + 1) % snapshot_every == 0 and i + 1 < iters_s2:
                    self.save_snapshot(snapshot_dir, "s2", i + 1)
            self.finish_s2()

        # the run completed: retire the snapshot so a RE-RUN of the same
        # command trains fresh instead of silently resuming a finished run
        # (which would mask code changes behind mostly-old training)
        if snap:
            self.clear_snapshot(snapshot_dir)

    def train_step_once(self, lpips_fn=None):
        opt = self.opt
        self.step += 1
        res = render_resolution_for_step(self.step)
        batch, shape = self.sample_batch()
        if self.mesh is not None:
            b = int(batch["times"].shape[0])
            dp = self.mesh.devices.size
            if b % dp != 0:
                raise ValueError(
                    f"batch of {b} render jobs not divisible by "
                    f"data_parallel={dp}; adjust batch_size/num_views/"
                    "num_frames so motions*views*frames % devices == 0")
            batch = self._mesh_mod.shard_batch(batch, self.mesh)
        step_fn = self.get_step_fn(self.stage, res, shape, lpips_fn)
        self._last_b = max(1, int(batch["times"].shape[0]))
        self.state, metrics = step_fn(self.state, batch)
        if int(metrics.get("nonfinite_grad", 0)):
            print(f"[guard] step {self.step}: non-finite/overflow gradient "
                  f"(sup={float(metrics.get('grad_sup', 0.0)):.2e} "
                  f"l2={float(metrics.get('grad_norm', 0.0)):.2e}) — "
                  "update skipped (params/moments untouched)")
        self._check_overflow(metrics)
        try:
            self.log_fn(self.stage, self.step, metrics, trainer=self)
        except TypeError:
            self.log_fn(self.stage, self.step, metrics)

        # checkpoint cadence
        if self.step % int(opt.save_inter) == 0:
            self.save_checkpoint(self.stage, step=self.step)

        # densify / prune cadence (reference `main_train_dimo.py:426-443`)
        if self.stage == "s1":
            if self.step % int(opt.FPS_iter) == 0:
                self._apply_fps()
            in_window = (self.step % int(opt.FPS_iter) >= int(opt.density_start_iter)
                         and self.step <= int(opt.density_end_iter))
            if in_window and self.step % int(opt.densification_interval) == 0:
                self._apply_densify_prune()
            if in_window and self.step % int(opt.opacity_reset_interval) == 0:
                self._apply_opacity_reset()
        elif self.stage == "s2" and self.step < int(opt.density_end_iter_s2):
            if (self.step % int(opt.densification_interval_s2) == 0
                    and opt.init_type == "ag"):
                self._apply_prune_only()

    # ------------------------------------------------------------------
    # densification wrappers (jitted per stage)

    def _densify_fn(self, name):
        key = (name, self.stage, self.mcfg)
        if key not in self._densify_fns:
            stage = self.stage
            cfg = self.mcfg
            opt = self.opt
            if name == "densify_prune":
                @jax.jit
                def fn(params, aux, mu, nu, rng):
                    return G.densify_and_prune(
                        cfg, params, aux, (mu, nu), rng, stage,
                        max_grad=opt.densify_grad_threshold,
                        min_opacity=opt.densify_opacity_threshold_s1,
                        extent=4.0, max_screen_size=1.0)
            elif name == "prune_only":
                @jax.jit
                def fn(params, aux):
                    return G.prune_only(
                        cfg, params, aux, stage,
                        min_opacity=opt.densify_opacity_threshold_s2,
                        extent=4.0, max_screen_size=1.0)
            elif name == "fps":
                num = int(opt.num_cpts)
                @jax.jit
                def fn(params, aux):
                    return G.fps_anneal(params, aux, num)
            elif name == "reset_opacity":
                @jax.jit
                def fn(params, mu, nu):
                    return G.reset_opacity(params, (mu, nu))
            self._densify_fns[key] = fn
        return self._densify_fns[key]

    def _apply_densify_prune(self):
        s = self.state
        rng, sub = jax.random.split(s.rng)
        params, aux, (mu, nu) = self._densify_fn("densify_prune")(
            s.params, s.aux, s.opt.mu, s.opt.nu, sub)
        self.state = s.replace(params=params, aux=aux,
                               opt=s.opt.replace(mu=mu, nu=nu), rng=rng)
        n = int(G.num_active(aux))
        print(f"Num of gaussians: {n}")
        if n > 0.9 * self.mcfg.capacity:
            self._grow_capacity(self.mcfg.capacity * 2)

    def _apply_prune_only(self):
        s = self.state
        params, aux = self._densify_fn("prune_only")(s.params, s.aux)
        self.state = s.replace(params=params, aux=aux)
        print(f"Num of gaussians after pruning: {int(G.num_active(aux))}")

    def _apply_fps(self):
        s = self.state
        params, aux = self._densify_fn("fps")(s.params, s.aux)
        self.state = s.replace(params=params, aux=aux)

    def _apply_opacity_reset(self):
        s = self.state
        params, (mu, nu) = self._densify_fn("reset_opacity")(
            s.params, s.opt.mu, s.opt.nu)
        self.state = s.replace(params=params, opt=s.opt.replace(mu=mu, nu=nu))

    def _grow_capacity(self, new_cap: int):
        """Pad all per-gaussian arrays to a larger capacity (host-side;
        triggers re-jit of the step functions)."""
        print(f"[capacity] growing {self.mcfg.capacity} -> {new_cap}")
        old = self.mcfg.capacity
        pad = new_cap - old

        def pad_leaf(x, fill=0.0):
            x = np.asarray(x)
            out = np.full((new_cap,) + x.shape[1:], fill, x.dtype)
            out[:old] = x
            return jnp.asarray(out)

        s = self.state
        p = s.params
        params = p.replace(
            xyz=pad_leaf(p.xyz), features_dc=pad_leaf(p.features_dc),
            features_rest=pad_leaf(p.features_rest),
            scaling=pad_leaf(p.scaling, -10.0),
            rotation=jnp.asarray(np.concatenate(
                [np.asarray(p.rotation),
                 np.tile([1, 0, 0, 0], (pad, 1)).astype(np.float32)])),
            opacity=pad_leaf(p.opacity, -10.0))
        aux = s.aux.replace(
            active=pad_leaf(s.aux.active, False),
            max_radii2d=pad_leaf(s.aux.max_radii2d),
            xyz_grad_accum=pad_leaf(s.aux.xyz_grad_accum),
            denom=pad_leaf(s.aux.denom))

        def pad_moments(m):
            return m.replace(**{
                name: pad_leaf(getattr(m, name))
                for name in ("xyz", "features_dc", "features_rest", "scaling",
                             "rotation", "opacity")})

        opt_state = s.opt.replace(mu=pad_moments(s.opt.mu),
                                  nu=pad_moments(s.opt.nu))
        self.mcfg = G.ModelConfig(**{**dataclass_asdict(self.mcfg),
                                     "capacity": new_cap})
        self.state = TrainState(params=params, aux=aux, opt=opt_state,
                                step=s.step, rng=s.rng)
        self._replicate_state()
        self._step_fns.clear()
        self._densify_fns.clear()

    # ------------------------------------------------------------------
    # stage transitions

    def prepare_train_s1(self):
        self.stage = "s1"
        self.step = 0
        self.state = self.state.replace(step=jnp.zeros((), jnp.int32))

    def finish_s1(self):
        """prune_s1_end + save (reference `main_train_dimo.py:199-206`)."""
        s = self.state
        op = jax.nn.sigmoid(np.asarray(s.params.opacity))[:, 0]
        keep = np.asarray(s.aux.active) & (op >= 0.01)
        self.state = s.replace(aux=s.aux.replace(active=jnp.asarray(keep)))
        print("Num of cpts after s1: ", int(keep.sum()))
        self.save_checkpoint("s1")

    def prepare_train_s2(self):
        """Copy s1 blob into control points, AG-init dense Gaussians, fresh
        optimizer (reference `prepare_train_s2`, `main_train_dimo.py:471-500`
        + trajectory caching at `:231-244`)."""
        s = self.state
        p = s.params
        active = np.asarray(s.aux.active)
        idx = np.where(active)[0]
        k = len(idx)

        cpt_cap = max(int(self.opt.num_cpts), k)
        n_per = int(self.opt.get("num_pts_per_cpt", 200))
        cap_s2 = _round_up(k * n_per, 2048)

        r_val = float(np.asarray(p.r)[0, 0])
        c_xyz = np.zeros((cpt_cap, 3), np.float32)
        c_xyz[:k] = np.asarray(p.xyz)[idx]
        c_radius = np.full((cpt_cap, 1), r_val, np.float32)
        c_active = np.zeros((cpt_cap,), bool)
        c_active[:k] = True

        self.mcfg = G.ModelConfig(
            sh_degree=self.mcfg.sh_degree, latent_dim=self.mcfg.latent_dim,
            num_latents=self.mcfg.num_latents, vae=self.mcfg.vae,
            capacity=cap_s2, cpt_capacity=cpt_cap,
            percent_dense=self.mcfg.percent_dense)

        params2, aux2 = G._blank(self.mcfg)
        params2 = params2.replace(
            c_xyz=jnp.asarray(c_xyz), c_radius=jnp.asarray(c_radius),
            r=p.r, latent=p.latent, timenet=p.timenet)
        aux2 = aux2.replace(c_active=jnp.asarray(c_active))
        if self.opt.init_type == "ag":
            params2, aux2 = G.initialize_ag(
                self.mcfg, params2, aux2, seed=self.seed,
                num_pts_per_cpt=n_per, init_ratio=self.opt.init_ratio)
        else:
            rng = np.random.RandomState(self.seed)
            pts = G._random_ball(rng, int(self.opt.num_pts), 0.5)
            from dimo_tpu.ops import sh as sh_ops
            colors = sh_ops.sh_to_rgb(
                rng.random((pts.shape[0], 3)).astype(np.float32) / 255.0)
            params2, aux2 = G.set_points_from_cloud(self.mcfg, params2, aux2,
                                                    pts, colors)
        aux2 = aux2.replace(c_active=jnp.asarray(c_active))

        self.state = TrainState(
            params=optim.strongify(params2), aux=aux2,
            opt=optim.init(optim.strongify(params2)),
            step=jnp.zeros((), jnp.int32), rng=s.rng)
        self._replicate_state()
        self.stage = "s2"
        self.step = 0
        self._step_fns.clear()
        self._densify_fns.clear()
        self.cache_s1_trajectories()

    def cache_s1_trajectories(self):
        """Cache per-motion control point trajectories for guidance
        (reference `main_train_dimo.py:231-244`): ONE vmapped call over
        (motion, frame) instead of M*F separate dispatches (1,071 at
        Trump-n51 scale). VAE latents are SAMPLED via reparameterization
        like the reference (`:234-238`), not collapsed to the mean."""
        F = self.num_frames
        ts = jnp.arange(F, dtype=jnp.float32) / F
        m_idx = jnp.arange(self.num_motions, dtype=jnp.int32)
        rng = jax.random.PRNGKey(self.seed + 7)
        m_rngs = (jax.random.split(rng, self.num_motions)
                  if self.mcfg.vae else None)

        @jax.jit
        def traj_all(p):
            def per_motion(m, krng):
                lat = G.sample_latent(p, m, krng)
                d, _ = jax.vmap(lambda t: timenet_mod.apply_timenet(
                    p.timenet, p.c_xyz, t, lat))(ts)        # (F, Mc, 3)
                return p.c_xyz[None] + d
            if self.mcfg.vae:
                return jax.vmap(per_motion)(m_idx, m_rngs)
            return jax.vmap(lambda m: per_motion(m, None))(m_idx)

        self.cpts_s1 = np.asarray(traj_all(self.state.params))
        self._dev_cpts = None          # refresh the device guidance cache

    def finish_s2(self):
        self.save_checkpoint("s2")

    # ------------------------------------------------------------------
    # checkpoint IO (reference directory layout)

    def save_checkpoint(self, stage: str, step=None):
        save_path = os.path.join(self.opt.save_path, stage)
        os.makedirs(save_path, exist_ok=True)
        s = self.state
        p = s.params
        active = np.asarray(s.aux.active)
        idx = np.where(active)[0]
        suffix = f"_{step}" if step else ""

        if stage == "s1":
            scale = np.broadcast_to(np.asarray(p.r), (len(idx), 3))
        else:
            scale = np.asarray(p.scaling)[idx]
        ply_io.save_gaussians(
            os.path.join(save_path, f"point_cloud{suffix}.ply"),
            np.asarray(p.xyz)[idx], np.asarray(p.features_dc)[idx],
            np.asarray(p.features_rest)[idx], np.asarray(p.opacity)[idx],
            scale, np.asarray(p.rotation)[idx])
        if stage >= "s2":
            c_idx = np.where(np.asarray(s.aux.c_active))[0]
            ply_io.save_control_points(
                os.path.join(save_path, f"point_cloud_c{suffix}.ply"),
                np.asarray(p.c_xyz)[c_idx], np.asarray(p.c_radius)[c_idx])
        ckpt_io.save_model(save_path, jax.tree.map(np.asarray, p.latent),
                           jax.tree.map(np.asarray, p.timenet), step=step)

    def save_full_state(self, path: str):
        """Full resumable snapshot incl. Adam moments (the reference's
        capture tuple, `latent_gs_renderer.py:296-315`, which its mains never
        call; here it's the supported elastic-resume path)."""
        ckpt_io.save_train_state(path, self.state)

    # ------------------------------------------------------------------
    # elastic mid-run snapshots (see train_dynamic docstring)

    def save_snapshot(self, dir_path: str, phase: str, done: int):
        """Atomic full-progress snapshot: TrainState (+ Adam moments), cached
        s1 trajectories, and the host-side scalars needed to continue
        (step/stage/capacities). Files are written to .tmp then renamed so a
        failure mid-write never corrupts the previous snapshot."""
        import json

        os.makedirs(dir_path, exist_ok=True)

        def atomic(name, writer):
            # keep the extension on the temp name (np.savez appends .npz
            # to names that lack it, which would break the rename)
            tmp = os.path.join(dir_path, "tmp_" + name)
            writer(tmp)
            os.replace(tmp, os.path.join(dir_path, name))

        atomic("snapshot_state.npz",
               lambda p: ckpt_io.save_train_state(p, self.state))
        if self.cpts_s1 is not None:
            atomic("snapshot_cpts.npz",
                   lambda p: np.savez(p, cpts_s1=np.asarray(self.cpts_s1)))
        meta = {"phase": phase, "done": int(done), "step": int(self.step),
                "stage": self.stage, "capacity": int(self.mcfg.capacity),
                "cpt_capacity": int(self.mcfg.cpt_capacity),
                "tile_capacity": int(self.tile_capacity)}
        atomic("snapshot_meta.json",
               lambda p: open(p, "w").write(json.dumps(meta)))

    def clear_snapshot(self, dir_path: str):
        for name in ("snapshot_meta.json", "snapshot_state.npz",
                     "snapshot_cpts.npz"):
            try:
                os.remove(os.path.join(dir_path, name))
            except FileNotFoundError:
                pass

    def peek_snapshot_phase(self, dir_path: str):
        """Phase ("s1"/"s2") of the snapshot in dir_path, or None — without
        restoring it (train_dynamic decides resume-vs-override first)."""
        import json
        meta_path = os.path.join(dir_path, "snapshot_meta.json")
        if not os.path.exists(meta_path):
            return None
        with open(meta_path) as f:
            return json.load(f).get("phase")

    def load_snapshot(self, dir_path: str):
        """Restore a save_snapshot; returns its meta dict or None if absent
        or inconsistent. The state tree is unflattened with the current
        treedef (leaf SHAPES come from the snapshot, so capacity growth
        between snapshots is fine); host batch RNG is reseeded from
        (seed, step)."""
        import json
        from dataclasses import replace as _dc_replace

        meta_path = os.path.join(dir_path, "snapshot_meta.json")
        if not os.path.exists(meta_path):
            return None
        with open(meta_path) as f:
            meta = json.load(f)
        new_state = ckpt_io.load_train_state(
            os.path.join(dir_path, "snapshot_state.npz"), self.state)
        # files are renamed state -> cpts -> meta; a crash between renames
        # can mix generations. state.step mirrors the host step counter, so
        # a mismatch detects the mix — refuse the snapshot rather than
        # resume with a desynced LR/densify cadence or stale capacities.
        state_step = int(np.asarray(jax.device_get(new_state.step)).ravel()[0])
        if state_step != int(meta["step"]):
            print(f"[snapshot] IGNORED inconsistent snapshot in {dir_path}: "
                  f"state.step={state_step} != meta.step={meta['step']} "
                  "(crash mid-save?); starting fresh")
            return None
        # Moment sanitize: snapshots written before the overflow guard can
        # carry Inf Adam nu (2026-08-20 scale512 post-mortem: huge finite
        # grads squared past f32 max). An Inf moment freezes its coord
        # forever; zeroing it just restarts that coord's moment EMA.
        nbad = int(sum(
            int((~np.isfinite(np.asarray(l))).sum())
            for l in jax.tree_util.tree_leaves((new_state.opt.mu,
                                                new_state.opt.nu))))
        if nbad:
            print(f"[snapshot] sanitized {nbad} non-finite Adam moment "
                  "entries (overflow-era snapshot)")
            fixed_opt = jax.tree.map(
                lambda l: jnp.where(jnp.isfinite(l), l, jnp.zeros_like(l))
                if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                          jnp.floating)
                else l,
                new_state.opt)
            new_state = _dc_replace(new_state, opt=fixed_opt)
        if (int(meta["capacity"]) != self.mcfg.capacity
                or int(meta["cpt_capacity"]) != self.mcfg.cpt_capacity):
            self.mcfg = _dc_replace(self.mcfg,
                                    capacity=int(meta["capacity"]),
                                    cpt_capacity=int(meta["cpt_capacity"]))
        self.state = new_state
        self._replicate_state()
        cpts_path = os.path.join(dir_path, "snapshot_cpts.npz")
        if os.path.exists(cpts_path):
            with np.load(cpts_path) as z:
                # numpy, not jnp: sample_batch slices cpts_s1 host-side
                # every step (a device gather would pay dispatch overhead)
                self.cpts_s1 = np.asarray(z["cpts_s1"])
                self._dev_cpts = None  # refresh the device guidance cache
        self.step = int(meta["step"])
        self.stage = meta["stage"]
        # clamp to the CURRENT ceiling: a snapshot written before the
        # ceiling was lowered must not resume into a faulting capacity
        self.tile_capacity = min(
            int(meta["tile_capacity"]),
            int(self.opt.get("tile_capacity_max", 4096)))
        self._step_fns.clear()
        self._densify_fns.clear()
        self.py_rng = random.Random(self.seed + self.step)
        np.random.seed((self.seed + self.step) % (2 ** 31))
        return meta

    def load_full_state(self, path: str):
        self.state = ckpt_io.load_train_state(path, self.state)

    def load_checkpoint(self, stage: str, step=None):
        load_path = os.path.join(self.opt.save_path, stage)
        suffix = f"_{step}" if step else ""
        g = ply_io.load_gaussians(
            os.path.join(load_path, f"point_cloud{suffix}.ply"),
            self.mcfg.sh_degree)
        n = g["xyz"].shape[0]
        cap = _round_up(max(n, 1), 2048) if n > self.mcfg.capacity \
            else self.mcfg.capacity
        if cap != self.mcfg.capacity:
            self.mcfg = G.ModelConfig(**{**dataclass_asdict(self.mcfg),
                                         "capacity": cap})
        params, aux = G._blank(self.mcfg)

        def fill(base, rows):
            out = np.asarray(base).copy()
            out[:n] = rows
            return jnp.asarray(out)

        params = params.replace(
            xyz=fill(params.xyz, g["xyz"]),
            features_dc=fill(params.features_dc, g["features_dc"]),
            features_rest=fill(params.features_rest, g["features_rest"]),
            scaling=fill(params.scaling, g["scaling"]),
            rotation=fill(params.rotation, g["rotation"]),
            opacity=fill(params.opacity, g["opacity"]))
        active = np.zeros((self.mcfg.capacity,), bool)
        active[:n] = True
        aux = aux.replace(active=jnp.asarray(active))

        cpath = os.path.join(load_path, f"point_cloud_c{suffix}.ply")
        if stage >= "s2" and os.path.exists(cpath):
            c = ply_io.load_control_points(cpath)
            kc = c["c_xyz"].shape[0]
            cpt_cap = max(self.mcfg.cpt_capacity, kc)
            c_xyz = np.zeros((cpt_cap, 3), np.float32)
            c_xyz[:kc] = c["c_xyz"]
            c_rad = np.full((cpt_cap, 1), -5.0, np.float32)
            c_rad[:kc] = c["c_radius"]
            c_act = np.zeros((cpt_cap,), bool)
            c_act[:kc] = True
            params = params.replace(c_xyz=jnp.asarray(c_xyz),
                                    c_radius=jnp.asarray(c_rad))
            aux = aux.replace(c_active=jnp.asarray(c_act))
        else:
            # s1 checkpoint: gaussians ARE the cpts
            cpt_cap = self.mcfg.cpt_capacity
            kc = min(n, cpt_cap)
            c_xyz = np.zeros((cpt_cap, 3), np.float32)
            c_xyz[:kc] = g["xyz"][:kc]
            c_act = np.zeros((cpt_cap,), bool)
            c_act[:kc] = True
            params = params.replace(c_xyz=jnp.asarray(c_xyz))
            aux = aux.replace(c_active=jnp.asarray(c_act))

        latent, timenet = ckpt_io.load_model(load_path, step=step,
                                             vae=self.mcfg.vae)
        params = params.replace(latent=latent, timenet=timenet)
        self.state = TrainState(
            params=optim.strongify(params), aux=aux,
            opt=optim.init(optim.strongify(params)),
            step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(self.seed))
        self._replicate_state()
        self._step_fns.clear()
        self._densify_fns.clear()


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def dataclass_asdict(dc):
    import dataclasses
    return {f.name: getattr(dc, f.name) for f in dataclasses.fields(dc)}
