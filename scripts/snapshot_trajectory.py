import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Parameter-statistics trajectory across the committed scale512-rerun
snapshots (round 5 collapse post-mortem).

The guarded rerun scored 11.87 dB (background-level) even though the
guard kept params finite — pointing at a PROGRESSIVE state collapse
(opacity prune spiral / scale collapse) rather than one NaN event. This
scans every autosaved snapshot generation in git history and prints the
stats that distinguish the hypotheses, with zero rendering cost:
  n_active, opacity distribution (post-sigmoid), scale distribution
  (post-exp), xyz/c_xyz spread, TimeNet weight absmax, Adam-nu health.

Usage:
  PYTHONPATH= JAX_PLATFORMS=cpu python -u scripts/snapshot_trajectory.py \
      --commits a3a8846,f1964f1,... --out probes_r5/snap_traj.json
"""
import argparse
import json
import subprocess


SNAP = "runs/eval_quality/snap_512_2800+6000_nolpips"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", required=True)
    ap.add_argument("--out", default="probes_r5/snap_traj.json")
    args = ap.parse_args()

    import numpy as np
    import jax
    from dimo_tpu.io.synthetic import make_synthetic_videos
    from dimo_tpu.train.loop import Trainer

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "eval_quality", os.path.join(os.path.dirname(__file__),
                                     "eval_quality.py"))
    eq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(eq)

    M, V, F, S, _, _, opt = eq.build_config(scale512=True)
    opt["save_path"] = "/tmp/snap_traj_run"
    images, masks, meta = make_synthetic_videos(
        num_motions=M, num_views=V, num_frames=F, ref_size=S, n_gauss=150,
        seed=0)
    tr = Trainer(opt, images, masks, meta)

    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    rows = []
    for c in args.commits.split(","):
        d = f"/tmp/snap_gen_{c}"
        os.makedirs(d, exist_ok=True)
        ok = True
        for f in ("snapshot_meta.json", "snapshot_state.npz",
                  "snapshot_cpts.npz"):
            r = subprocess.run(["git", "show", f"{c}:{SNAP}/{f}"],
                               capture_output=True)
            if r.returncode:
                ok = False
                break
            with open(os.path.join(d, f), "wb") as fh:
                fh.write(r.stdout)
        if not ok:
            print(f"[traj] {c}: snapshot files missing; skipped", flush=True)
            continue
        if tr.load_snapshot(d) is None:
            print(f"[traj] {c}: inconsistent snapshot; skipped", flush=True)
            continue
        p, aux, o = tr.state.params, tr.state.aux, tr.state.opt
        act = np.asarray(aux.active).astype(bool)
        n_act = int(act.sum())
        opa = sig(np.asarray(p.opacity)[act, 0])
        sc = np.exp(np.asarray(p.scaling)[act])
        xyz = np.asarray(p.xyz)[act]
        # load_snapshot now SANITIZES non-finite moments; count them from
        # the raw file so the trajectory still shows when overflow began
        with np.load(os.path.join(d, "snapshot_state.npz")) as z:
            nu_bad = int(sum(
                (~np.isfinite(z[k])).sum() for k in z.files
                if k != "_num_leaves" and z[k].dtype.kind == "f"))
        tn_mx = max(float(np.abs(np.asarray(l)).max())
                    for l in jax.tree_util.tree_leaves(p.timenet))
        row = {
            "commit": c, "step": tr.step, "stage": tr.stage,
            "n_active": n_act,
            "opacity_mean": float(opa.mean()) if n_act else None,
            "opacity_med": float(np.median(opa)) if n_act else None,
            "opacity_frac_gt_005": float((opa > 0.005).mean())
            if n_act else None,
            "scale_med": float(np.median(sc)) if n_act else None,
            "scale_max": float(sc.max()) if n_act else None,
            "scale_min": float(sc.min()) if n_act else None,
            "xyz_absmax": float(np.abs(xyz).max()) if n_act else None,
            "c_xyz_absmax": float(np.abs(np.asarray(p.c_xyz)).max()),
            "timenet_absmax": tn_mx,
            "nu_nonfinite": nu_bad,
        }
        rows.append(row)
        print("[traj]", json.dumps(row), flush=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"[traj] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
