import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""On-chip A/B sweep of the compositor knobs (DIMO_S_PER_BUF, DIMO_Y_REPEAT).

Each knob combo needs a fresh interpreter (module-level constants), so this
script times ONE combo per invocation and appends a JSON line to
/tmp/dimo_knob_sweep.jsonl.  Run via:

    for s in 4 8 16; do for y in 0 1; do
        DIMO_S_PER_BUF=$s DIMO_Y_REPEAT=$y python -u scripts/sweep_knobs.py
    done; done

Only the flagship full ch3 render is timed (bench.py's headline shape,
cap=1024) to keep per-combo compile cost to a single executable.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_scene
from dimo_tpu.models.renderer import render, find_knn
from dimo_tpu.ops.rasterizer import strips as strips_mod
from dimo_tpu.ops.rasterizer import composite_strips as cs_mod

CAP = int(os.environ.get("DIMO_CAP", "1024"))
ROUNDS = 300

cfg, params, aux, cam = _flagship_scene()
knn = jax.jit(find_knn)(params, aux)
bg = jnp.ones((3,))


@jax.jit
def fwd(p, t):
    out = render(cfg, p, aux, cam, t, "s2", 1, 512, 512, bg,
                 knn_cache=knn, capacity=CAP, channels=3)
    return out["image"]


img = fwd(params, 0.0)
img.block_until_ready()
t0 = time.time()
for _ in range(ROUNDS):
    img = fwd(params, 0.0)
img.block_until_ready()
fps = ROUNDS / (time.time() - t0)
row = {"s_per_buf": strips_mod.S_PER_BUF, "y_repeat": cs_mod.Y_REPEAT,
       "fwd_inloop": cs_mod.FWD_INLOOP,
       "capacity": CAP, "fps_ch3": round(fps, 2)}
print(json.dumps(row))
with open("/tmp/dimo_knob_sweep.jsonl", "a") as f:
    f.write(json.dumps(row) + "\n")
