import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Bisection harness for the tile_capacity=4096 device fault (VERDICT r4 #2).

The fault: a TPU worker crash (UNAVAILABLE/ABORTED/INTERNAL) reproduced
2026-08-19 at the 256^2 eval_quality shape (12k gaussians, 64 strips)
right after the 2048->4096 tile-capacity escalation recompile, mid-s2.
The round-3 cap4096 validation only covered the 512^2 flagship shape, so
the fault is SHAPE-DEPENDENT. Mitigation so far: tile_capacity_max=2048,
which truncates depth tails during training and is the leading suspect
for the failing 26 dB quality gate.

Round-2's recipe (CLAUDE.md): per-kernel DIMO_FORCE_INTERPRET knobs to
take one Mosaic kernel at a time off the chip, splitting compile-vs-run,
then replaying the crash step. This script packages it:

  # single attempt (crashes the worker if the fault fires; harmless to
  # the tunnel -- the next process works immediately):
  python -u scripts/bisect_cap4096.py --iters 40,60

  # full matrix, one subprocess per interpret combo (budget ~10 min each;
  # fresh kernel-shape compiles through the tunnel can exceed 7 min):
  python -u scripts/bisect_cap4096.py --matrix --iters 40,60

Interpret keys (see _interpret() in each kernel module): sfwd/sbwd strip
compositor, sgfwd/sgbwd smallgather (LBS one-hot), windma window DMA
readout (knob-gated), all. A combo that SURVIVES while its complement
crashes pins the faulting kernel. If `all` still crashes, the fault is in
an XLA op (pair sort / searchsorted / window gather), not Pallas.

ONE TPU process at a time: do not run while the eval run owns the chip.
"""
import argparse
import json
import subprocess
import time

MARK = "[bisect]"


def run_once(iters: str, capacity: int) -> None:
    """In-process attempt at the repro shape. Phase markers + per-phase
    block_until_ready localize compile-vs-run crashes in the log."""
    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from eval_quality import build_config
    import jax

    s1_it, s2_it = (int(x) for x in iters.split(","))
    M, V, F, S, _, _, opt = build_config(scale512=False,
                                         iters=f"{s1_it},{s2_it}")
    opt["tile_capacity"] = capacity
    opt["tile_capacity_max"] = capacity
    # eval_quality's snapshot path must not collide with a real run
    opt["save_path"] = "/tmp/bisect_cap4096_run"

    from dimo_tpu.io.synthetic import make_synthetic_videos
    from dimo_tpu.train.loop import Trainer

    images, masks, meta = make_synthetic_videos(
        num_motions=M, num_views=V, num_frames=F, ref_size=S, n_gauss=150,
        seed=0)
    print(f"{MARK} backend={jax.default_backend()} shape={S} cap={capacity}"
          f" interpret={os.environ.get('DIMO_FORCE_INTERPRET', '')!r}",
          flush=True)
    tr = Trainer(opt, images, masks, meta)
    assert tr.tile_capacity == capacity, tr.tile_capacity
    t0 = time.time()
    print(f"{MARK} s1+s2 start ({s1_it}+{s2_it} iters)", flush=True)
    tr.train_dynamic(s1_it, s2_it, "")
    # force every enqueued step to actually execute before declaring ok
    # (async dispatch masks crash sites -- CLAUDE.md round-2 facts)
    n = int(np.asarray(tr.state.aux.active).sum())
    print(f"{MARK} s2 done {time.time()-t0:.0f}s n_active={n}", flush=True)
    print(json.dumps({"ok": True, "capacity": capacity,
                      "interpret": os.environ.get("DIMO_FORCE_INTERPRET", ""),
                      "iters": [s1_it, s2_it]}), flush=True)


COMBOS = ["", "sbwd", "sfwd", "sfwd,sbwd", "sgfwd,sgbwd", "all"]


def run_matrix(iters: str, capacity: int, timeout: int) -> None:
    results = {}
    for combo in COMBOS:
        env = dict(os.environ)
        env["DIMO_FORCE_INTERPRET"] = combo
        label = combo or "none"
        print(f"{MARK} === combo {label} ===", flush=True)
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__),
                 "--iters", iters, "--capacity", str(capacity)],
                env=env, timeout=timeout, capture_output=True, text=True)
            tail = "\n".join(p.stdout.strip().splitlines()[-6:])
            print(tail, flush=True)
            results[label] = {"rc": p.returncode,
                              "ok": '"ok": true' in p.stdout,
                              "seconds": round(time.time() - t0, 1),
                              "tail": tail[-500:]}
        except subprocess.TimeoutExpired:
            results[label] = {"rc": "timeout", "ok": False,
                              "seconds": round(time.time() - t0, 1)}
        print(f"{MARK} combo {label}: {results[label]['ok']}", flush=True)
        # a crashed worker doesn't poison the tunnel, but give it a beat
        time.sleep(10)
    out = "bisect_cap4096.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"{MARK} wrote {out}: "
          + json.dumps({k: v["ok"] for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", default="40,60")
    ap.add_argument("--capacity", type=int, default=4096)
    ap.add_argument("--matrix", action="store_true")
    ap.add_argument("--timeout", type=int, default=900,
                    help="per-combo subprocess timeout (matrix mode)")
    args = ap.parse_args()
    if args.matrix:
        run_matrix(args.iters, args.capacity, args.timeout)
    else:
        run_once(args.iters, args.capacity)
