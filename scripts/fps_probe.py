import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Minimal render-fps probe for knob sweeps: one number, fast.

Usage: python -u scripts/fps_probe.py [rounds] [capacity] [channels]
Knobs ride env vars (DIMO_FWD_INLOOP, DIMO_S_PER_BUF, DIMO_Y_REPEAT, ...)
which are read at import time — one combo per process.
"""
import time

import jax
import jax.numpy as jnp

rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 300
cap = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
ch = int(sys.argv[3]) if len(sys.argv) > 3 else 3

from __graft_entry__ import _flagship_scene
from dimo_tpu.models.renderer import render, find_knn

cfg, params, aux, cam = _flagship_scene()
knn = jax.jit(find_knn)(params, aux)
bg = jnp.ones((3,))


grad_mode = os.environ.get("PROBE_GRAD", "") == "1"

if grad_mode:
    @jax.jit
    def fwd(p, t):
        def loss(pp):
            out = render(cfg, pp, aux, cam, t, "s2", 1, 512, 512, bg,
                         knn_cache=knn, capacity=cap)
            return jnp.sum(out["image"] ** 2)
        return jax.grad(loss)(p).xyz
else:
    @jax.jit
    def fwd(p, t):
        return render(cfg, p, aux, cam, t, "s2", 1, 512, 512, bg,
                      knn_cache=knn, capacity=cap, channels=ch)["image"]


img = fwd(params, 0.0)
img.block_until_ready()
t0 = time.time()
for _ in range(rounds):
    img = fwd(params, 0.0)
img.block_until_ready()
dt = time.time() - t0
knobs = {k: v for k, v in os.environ.items()
         if k.startswith(("DIMO_", "PROBE_"))}
ms = dt / rounds * 1000
print(f"fps={rounds / dt:.1f} ({ms:.2f} ms) cap={cap} ch={ch} knobs={knobs}")
