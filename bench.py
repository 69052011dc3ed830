"""Benchmark harness: prints ONE JSON line for the driver.

Metric: stage-2 deformation-render throughput at 512x512 (the reference's
`test_fps` harness, `main_test_dimo.py:872-894`: one warmup render then N
timed renders of the full TimeNet -> KNN-LBS -> rasterizer pipeline on a
~100k-Gaussian model).

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
comparison point is the commonly reported ashawkey/diff-gaussian-rasterization
throughput for a ~100k-Gaussian 512^2 scene on A100 (~250 FPS) — the
BASELINE.json north star asks for >=2x that per chip.
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_FPS_A100 = 250.0
ROUNDS = 500


def main() -> None:
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_scene
    from dimo_tpu.models.renderer import render, find_knn

    cfg, params, aux, cam = _flagship_scene()
    bg = jnp.ones((3,))

    # KNN cached once like the reference's test-time find_knn
    knn_cache = jax.jit(find_knn)(params, aux)

    @jax.jit
    def fwd(p, t):
        out = render(cfg, p, aux, cam, t, "s2", 1, 512, 512, bg,
                     knn_cache=knn_cache, capacity=1024)
        return out["image"]

    img = fwd(params, 0.0)
    img.block_until_ready()

    t0 = time.time()
    for i in range(ROUNDS):
        img = fwd(params, 0.0)
    img.block_until_ready()
    t1 = time.time()

    fps = ROUNDS / (t1 - t0)
    print(json.dumps({
        "metric": "render_fps_512_s2_100k",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS_A100, 3),
    }))


if __name__ == "__main__":
    main()
