import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Root-cause harness for the scale512 s2 NaN divergence (round 5).

The completed scale512 eval run (eval_quality.json: 11.64 dB, passed
false) turned out to be FULLY NaN-diverged: every committed s2 snapshot
(earliest preserved: s2 step 2750) has 100% NaN xyz/TimeNet weights and
Inf Adam nu, while the s1 stage checkpoint is clean. So the divergence
happens in s2 steps 0-2750 (or in the s1->s2 AG-init transition), and the
11.64 dB is "render == background", NOT capacity truncation.

This harness loads the committed s1 checkpoint, replays the transition,
and steps s2 with a per-step NaN watch on the loss + params:

  # transition scan + first N steps (CPU works; chip is ~50x faster):
  python -u scripts/nan_bisect_s2.py --s1 runs/eval_quality/s1 --steps 50

  # full hunt on the chip (0.38 s/step; 2750 steps ~ 20 min):
  python -u scripts/nan_bisect_s2.py --s1 runs/eval_quality/s1 --steps 2750

On the first non-finite loss or param leaf it dumps the step number, the
offending metric names, and (with --save-state) the pre-step TrainState
pickle for op-level replay (round-2 crash-step recipe).
"""
import argparse
import json
import shutil
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s1", default="runs/eval_quality/s1",
                    help="s1 stage checkpoint dir (point_cloud.ply + "
                         "latent_codes.npz + timenet.npz)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--save-state", default="",
                    help="npz path: snapshot the TrainState every step so "
                         "the first NaN step can be replayed op-by-op")
    ap.add_argument("--out", default="nan_bisect_s2.json")
    ap.add_argument("--seed", type=int, default=0)
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

    M, V, F, S, iters_s1, iters_s2, opt = eq.build_config(scale512=True)
    # sandbox save_path: load_checkpoint reads from save_path/s1, and we
    # must never write into the real run dir
    sandbox = "/tmp/nan_bisect_run"
    os.makedirs(sandbox, exist_ok=True)
    dst = os.path.join(sandbox, "s1")
    if os.path.abspath(args.s1) != os.path.abspath(dst):
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(args.s1, dst)
    opt["save_path"] = sandbox

    images, masks, meta = make_synthetic_videos(
        num_motions=M, num_views=V, num_frames=F, ref_size=S, n_gauss=150,
        seed=0)
    last = {}

    def capture(stage, step, metrics, trainer=None):
        last.clear()
        last.update(metrics)

    tr = Trainer(opt, images, masks, meta, log_fn=capture)
    print(f"[nan_bisect] backend={jax.default_backend()}", flush=True)

    def scan(tag):
        bad = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                (tr.state.params, tr.state.opt))[0]:
            a = np.asarray(leaf)
            if a.dtype.kind == "f" and not np.isfinite(a).all():
                name = jax.tree_util.keystr(path)
                bad.append(f"{name} NaN={int(np.isnan(a).sum())} "
                           f"Inf={int(np.isinf(a).sum())}")
        if bad:
            print(f"[nan_bisect] NON-FINITE at {tag}:", flush=True)
            for b in bad[:20]:
                print("   ", b, flush=True)
        return bad

    tr.load_checkpoint("s1")
    assert not scan("post-load(s1)"), "s1 checkpoint itself is bad"
    tr.prepare_train_s2()
    bad = scan("post-prepare_train_s2 (AG init)")
    result = {"backend": jax.default_backend(),
              "transition_bad": bad, "first_bad_step": None,
              "bad_metrics": None, "steps_run": 0}
    if not bad:
        t0 = time.time()
        for i in range(1, args.steps + 1):
            tr.train_step_once()
            m = {k: float(v) for k, v in last.items()
                 if jnp.asarray(v).ndim == 0}
            # cheap per-step watch: any non-finite metric ends the hunt;
            # the step.py guard skips the update on non-finite GRADS and
            # reports it as nonfinite_grad=1 — that IS the event we hunt
            badm = {k: v for k, v in m.items() if not np.isfinite(v)}
            if m.get("nonfinite_grad", 0):
                badm["nonfinite_grad"] = 1.0
            if i % 25 == 0 or i <= 3 or badm:
                loss = m.get("loss", float("nan"))
                print(f"[nan_bisect] s2 step {i}: loss={loss:.5f} "
                      f"({(time.time()-t0)/i:.2f} s/step)", flush=True)
            if badm:
                print(f"[nan_bisect] FIRST NON-FINITE METRIC at s2 step {i}:"
                      f" {sorted(badm)}", flush=True)
                scan(f"s2 step {i}")
                result.update(first_bad_step=i,
                              bad_metrics=sorted(badm), steps_run=i)
                break
            result["steps_run"] = i
        else:
            scan(f"s2 step {args.steps} (end of hunt)")
            if args.save_state:
                # park the still-finite state for op-level replay of the
                # next step (run again with --steps first_bad-1 first)
                tr.save_snapshot(args.save_state, "s2", args.steps)
                print(f"[nan_bisect] state saved to {args.save_state}",
                      flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("[nan_bisect]", json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
