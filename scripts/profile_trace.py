import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Sustained-fps breakdown via jax.profiler: traces the flagship render loop
and prints per-op device times aggregated by kernel/fusion name — the REAL
distribution (single-stage micro-benchmarks each carry ~0.9 ms dispatch)."""
import glob
import gzip
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_scene
from dimo_tpu.models.renderer import render, find_knn

cfg, params, aux, cam = _flagship_scene()
bg = jnp.ones((3,))
knn_cache = jax.jit(find_knn)(params, aux)
CH = int(os.environ.get("DIMO_PROF_CH", "3"))


@jax.jit
def fwd(p, t):
    out = render(cfg, p, aux, cam, t, "s2", 1, 512, 512, bg,
                 knn_cache=knn_cache, capacity=512, channels=CH)
    return out["image"]


img = fwd(params, 0.0)
img.block_until_ready()

t0 = time.time()
for _ in range(50):
    img = fwd(params, 0.0)
img.block_until_ready()
print("sustained: %.2f ms/frame" % ((time.time() - t0) / 50 * 1000))

trace_dir = "/tmp/dimo_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(20):
        img = fwd(params, 0.0)
    img.block_until_ready()

# aggregate device-side op durations from the trace proto (xplane.pb is not
# json; use the trace.json.gz the profiler also emits)
paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
agg = {}
total = 0.0
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid_name = ev.get("pid")
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1000.0  # us -> ms
        args = ev.get("args", {}) or {}
        # keep device op events only (they carry run_id/scope args on TPU)
        if "run_id" in args or "program_id" in args or "tf_op" in args:
            key = name.split(".")[0][:60]
            agg[key] = agg.get(key, 0.0) + dur
            total += dur

for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{v/20:9.3f} ms/frame  {k}")
print(f"{total/20:9.3f} ms/frame  TOTAL(device)")
