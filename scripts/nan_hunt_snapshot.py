import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Root-cause the guarded scale512 rerun's non-finite gradients (round 5).

The guarded rerun (eval_quality --scale512, non-finite-grad guard active)
hit persistent grad non-finiteness from s2 step ~2392: 698 of ~960 steps
SKIPPED between 2392 and 3351 — params stay finite (the guard works) but
training is mostly frozen. This harness loads the live run's snapshot
(CPU = numerical oracle; interpret-on-TPU is NOT trustworthy — round-2
fact) and localizes the source:

  phase 0: param/moment field statistics (degenerate scales/opacities/
           latents jump out here without any compute);
  phase 1: per-motion forward loss terms (which term goes non-finite);
  phase 2: per-motion param grads, then per-TERM grads on the first
           failing motion, then per-LEAF finiteness of that term's grad.

Usage:
  PYTHONPATH= JAX_PLATFORMS=cpu python -u scripts/nan_hunt_snapshot.py \
      --snap /tmp/snap_nanhunt --trials 4 --out probes_r5/nan_hunt.json
"""
import argparse
import json
import shutil
import time


def leafstats(name, a):
    import numpy as np
    a = np.asarray(a)
    if a.size == 0 or a.dtype.kind not in "fc":
        return None
    nf = int((~np.isfinite(a)).sum())
    return {"name": name, "shape": list(a.shape), "nonfinite": nf,
            "min": float(np.nanmin(a)), "max": float(np.nanmax(a)),
            "absmax": float(np.nanmax(np.abs(a)))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snap", default="/tmp/snap_nanhunt")
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--out", default="probes_r5/nan_hunt.json")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from dimo_tpu.io.synthetic import make_synthetic_videos
    from dimo_tpu.train.loop import Trainer

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "eval_quality", os.path.join(os.path.dirname(__file__),
                                     "eval_quality.py"))
    eq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(eq)

    M, V, F, S, _, _, opt = eq.build_config(scale512=True)
    opt["save_path"] = "/tmp/nan_hunt_run"
    images, masks, meta = make_synthetic_videos(
        num_motions=M, num_views=V, num_frames=F, ref_size=S, n_gauss=150,
        seed=0)
    tr = Trainer(opt, images, masks, meta)
    resumed = tr.load_snapshot(args.snap)
    print(f"[hunt] backend={jax.default_backend()} resumed={resumed} "
          f"stage={tr.stage} step={tr.step} cap={tr.tile_capacity}",
          flush=True)
    report = {"resumed": resumed, "step": tr.step, "stage": tr.stage}

    # ---- phase 0: state statistics ---------------------------------
    flat = []
    p = tr.state.params
    for field in p.__dataclass_fields__ if hasattr(p, "__dataclass_fields__") \
            else []:
        pass
    leaves, treedef = jax.tree_util.tree_flatten_with_path(
        {"params": tr.state.params, "opt": tr.state.opt})
    for path, leaf in leaves:
        name = jax.tree_util.keystr(path)
        st = leafstats(name, leaf)
        if st:
            flat.append(st)
    bad = [s for s in flat if s["nonfinite"]]
    big = sorted(flat, key=lambda s: -s["absmax"])[:8]
    print(f"[hunt] phase0: {len(flat)} float leaves, "
          f"{len(bad)} with non-finite values", flush=True)
    for s in bad[:10]:
        print("  NONFINITE", s, flush=True)
    for s in big:
        print(f"  big {s['name']} absmax={s['absmax']:.3e} "
              f"min={s['min']:.3e} max={s['max']:.3e}", flush=True)
    report["phase0_nonfinite_leaves"] = bad
    report["phase0_biggest"] = big

    # ---- phases 1+2: per-motion forward + grads --------------------
    from dimo_tpu.train.step import make_train_step
    from dimo_tpu.train.loop import loss_config_from_opt, \
        render_resolution_for_step

    res = render_resolution_for_step(tr.step)
    key_terms = ["loss", "mse", "ssim_loss", "mask_loss", "arap", "ga",
                 "smooth", "bilateral", "kl"]

    # loss fns keyed on the SAMPLED per-motion (views, frames) shape —
    # _sample_meta draws a view/frame subset, so the batch is NOT (V, F)
    _fns = {}

    def fns_for(nv, nf):
        if (nv, nf) not in _fns:
            step_fn = make_train_step(
                tr.mcfg, loss_config_from_opt(tr.opt, tr.stage), tr.stage,
                res, res, 1, nv, nf, capacity=tr.tile_capacity,
                lpips_fn=None, use_guidance=True)
            loss_fn = step_fn.loss_fn
            jloss = jax.jit(loss_fn)
            jgrad = jax.jit(jax.grad(loss_fn, has_aux=True))

            def terms_vec(pp, taps, b1, sub, step, loss_fn=loss_fn):
                _, (mm, _) = loss_fn(pp, taps, tr.state.aux, b1, sub, step)
                return jnp.stack([mm[k] for k in key_terms if k in mm])

            _fns[(nv, nf)] = (jloss, jgrad, jax.jit(jax.jacrev(terms_vec)))
        return _fns[(nv, nf)]
    rng = jax.random.PRNGKey(0)
    trials = []
    t0 = time.time()
    for trial in range(args.trials):
        batch, bshape = tr.sample_batch()
        B = int(batch["times"].shape[0])
        n_m, nv, nf = bshape
        per_m = B // n_m
        jloss, jgrad, jterms_jac = fns_for(nv, nf)
        found = None
        for m in range(n_m):
            sl = lambda x: x[m * per_m:(m + 1) * per_m] \
                if hasattr(x, "shape") and x.ndim and x.shape[0] == B else x
            b1 = jax.tree.map(sl, batch)
            taps = jnp.zeros((per_m, tr.state.params.xyz.shape[0], 2))
            rng, sub = jax.random.split(rng)

            loss, (mets, _) = jloss(tr.state.params, taps, tr.state.aux,
                                    b1, sub, jnp.int32(tr.step))
            fwd = {k: float(mets[k]) for k in key_terms if k in mets}
            fwd_bad = [k for k, v in fwd.items() if not np.isfinite(v)]

            g, _ = jgrad(tr.state.params, taps, tr.state.aux, b1, sub,
                         jnp.int32(tr.step))
            gleaves, _ = jax.tree_util.tree_flatten_with_path(g)
            gbad = [jax.tree_util.keystr(path) for path, leaf in gleaves
                    if not bool(jnp.all(jnp.isfinite(leaf)))]
            lat = int(np.asarray(b1["latent_idx"])[0])
            print(f"[hunt] trial {trial} motion-slot {m} (latent {lat}): "
                  f"loss={float(loss):.4f} fwd_bad={fwd_bad} "
                  f"grad_bad={len(gbad)} ({(time.time()-t0):.0f}s)",
                  flush=True)
            rec = {"trial": trial, "slot": m, "latent": lat, "fwd": fwd,
                   "fwd_bad": fwd_bad, "grad_bad_leaves": gbad}
            trials.append(rec)
            if gbad and found is None:
                found = (b1, taps, sub, rec)
        if found is not None:
            b1, taps, sub, rec = found
            # per-TERM grads on the failing slice: ONE jitted jacrev
            # computes every term's backward (terms share the forward)
            jac = jterms_jac(tr.state.params, taps, b1, sub,
                             jnp.int32(tr.step))
            jl, _ = jax.tree_util.tree_flatten_with_path(jac)
            term_bad = {k: [] for k in key_terms}
            for path, leaf in jl:
                name = jax.tree_util.keystr(path)
                fin = jnp.all(jnp.isfinite(
                    leaf.reshape(leaf.shape[0], -1)), axis=1)
                for i, k in enumerate(key_terms[:leaf.shape[0]]):
                    if not bool(fin[i]):
                        term_bad[k].append(name)
            for k, badl in term_bad.items():
                print(f"[hunt] term {k}: bad_leaves={badl}", flush=True)
            rec["term_grad_bad"] = term_bad
            # keep the failing batch for op-level replay
            np.savez("/tmp/nan_hunt_failing_batch.npz",
                     **{k: np.asarray(v) for k, v in b1.items()
                        if k != "camera"})
            break
    report["trials"] = trials
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, default=str)
    print(f"[hunt] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
