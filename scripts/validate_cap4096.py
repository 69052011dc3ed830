import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""On-chip proof that tile_capacity=4096 trains cleanly (VERDICT r2 #2).

Runs a short but REAL two-stage segment at reference scale (512^2,
51,200 s2 gaussians) with the strip compositor's per-strip capacity forced
to 4096 from the first step — both composite fwd and bwd Mosaic-compiled
inside the full train-step graph, the configuration that faulted the chip
at 4096 under the round-2 tile compositor. Writes cap4096.json.

Usage: python -u scripts/validate_cap4096.py [--iters 30,30]
"""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", default="30,30")
    ap.add_argument("--out", default="cap4096.json")
    args = ap.parse_args()
    s1_it, s2_it = (int(x) for x in args.iters.split(","))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from eval_quality import build_config
    import jax
    from dimo_tpu.io.synthetic import make_synthetic_videos
    from dimo_tpu.train.loop import Trainer

    M, V, F, S, _, _, opt = build_config(scale512=True,
                                         iters=f"{s1_it},{s2_it}")
    opt["tile_capacity"] = 4096
    opt["tile_capacity_max"] = 4096
    images, masks, meta = make_synthetic_videos(
        num_motions=M, num_views=V, num_frames=F, ref_size=S, n_gauss=150,
        seed=0)

    tr = Trainer(opt, images, masks, meta)
    assert tr.tile_capacity == 4096, tr.tile_capacity
    t0 = time.time()
    tr.train_dynamic(s1_it, s2_it, "")
    dt = time.time() - t0
    n_gauss = int(np.asarray(tr.state.aux.active).sum())
    result = {
        "ok": True,
        "backend": jax.default_backend(),
        "tile_capacity": tr.tile_capacity,
        "resolution": S,
        "n_gaussians": n_gauss,
        "iters": [s1_it, s2_it],
        "seconds": round(dt, 1),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("[cap4096]", json.dumps(result))


if __name__ == "__main__":
    main()
