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


def selfcheck() -> dict:
    """On-hardware agreement of the Mosaic-compiled tiled rasterizer vs the
    dense oracle (values + one gradient): compiled behavior can diverge from
    the interpreter-mode CPU tests (f32 iota, scalar stores, layout bugs)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from dimo_tpu.ops.rasterizer import rasterize, rasterize_dense
    from dimo_tpu.utils import cameras

    rng = np.random.RandomState(3)
    n = 400
    means = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    scales = jnp.asarray(np.exp(rng.uniform(-4.5, -3.0, (n, 3))), jnp.float32)
    quats = jnp.asarray(rng.randn(n, 4), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.95, (n, 1)), jnp.float32)
    sh = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 1, 3)), jnp.float32)
    cam = cameras.Camera.from_c2w(cameras.orbit_camera(15, 40, 2.0), 0.6, 0.6)
    bg = jnp.ones((3,))
    W, H = 128, 64   # one tile: keeps the extra compile under a minute

    def run(fn):
        def loss(op):
            out = fn(means, scales, quats, op, sh, cam, W, H, bg,
                     capacity=512) if fn is rasterize else \
                  fn(means, scales, quats, op, sh, cam, W, H, bg)
            return jnp.sum(out.image ** 2), out.image
        (l, img), g = jax.value_and_grad(loss, has_aux=True)(opac)
        return np.asarray(img), np.asarray(g)

    img_t, g_t = run(rasterize)
    img_o, g_o = run(rasterize_dense)
    img_err = float(np.abs(img_t - img_o).max())
    g_scale = float(np.abs(g_o).max()) or 1.0
    g_err = float(np.abs(g_t - g_o).max()) / g_scale
    return {"selfcheck_img_maxerr": round(img_err, 6),
            "selfcheck_grad_relerr": round(g_err, 6),
            "selfcheck_ok": bool(img_err < 1e-2 and g_err < 1e-2)}


def main() -> None:
    import hashlib
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_scene
    from dimo_tpu.models.renderer import render, find_knn

    # selfcheck ALWAYS runs: the driver-captured JSON line is the round's
    # evidence that the Mosaic-compiled kernels agree with the oracle ON
    # THIS HARDWARE (round-2 verdict: builder-asserted numbers don't count).
    check = selfcheck()

    cfg, params, aux, cam = _flagship_scene()
    # scene identity: rounds are only comparable when this hash matches
    # (round-2 lesson: a scene redesign muddied the 62->153 trend)
    scene_hash = hashlib.sha256(
        np.asarray(params.xyz).tobytes()
        + np.asarray(params.scaling).tobytes()
        + np.asarray(params.opacity).tobytes()).hexdigest()[:12]
    bg = jnp.ones((3,))

    # KNN cached once like the reference's test-time find_knn
    knn_cache = jax.jit(find_knn)(params, aux)

    def timed_fps(channels: int, rounds: int, capacity: int) -> float:
        @jax.jit
        def fwd(p, t):
            out = render(cfg, p, aux, cam, t, "s2", 1, 512, 512, bg,
                         knn_cache=knn_cache, capacity=capacity,
                         channels=channels)
            return out["image"]

        img = fwd(params, 0.0)
        img.block_until_ready()
        t0 = time.time()
        for _ in range(rounds):
            img = fwd(params, 0.0)
        img.block_until_ready()
        return rounds / (time.time() - t0)

    # HEADLINE at capacity=1024: the capacity where the flagship image is
    # CONVERGED wrt per-strip truncation (CPU study 2026-08-18: cap512
    # drops 2/3 of entries, 5.8% of pixels off by >1/255 vs cap2048;
    # cap1024 maxdiff 0.05 on 0.05% of pixels — comparable to the CUDA
    # reference's own T<1e-4 early-terminate error). Rounds 1-3 measured
    # cap512; fps_cap512 keeps that trend comparable.
    CAP = 1024
    # rgb-only fast path (the reference test_fps consumes only .image) and
    # the 7-channel figure the reference's default add_normal=True train
    # path always pays (rgb+depth+normal FMAs)
    fps = timed_fps(3, ROUNDS, CAP)
    fps7 = timed_fps(7, ROUNDS // 2, CAP)
    fps_cap512 = timed_fps(3, ROUNDS // 2, 512)

    # capacity self-evidence (VERDICT r3 #6): the headline is only honest if
    # CAP is truncation-converged on THIS scene — measure the image delta vs
    # an effectively-lossless capacity ON CHIP every bench run, rather than
    # citing the one-off CPU study.
    def render_once(capacity: int):
        @jax.jit
        def f(p, t):
            out = render(cfg, p, aux, cam, t, "s2", 1, 512, 512, bg,
                         knn_cache=knn_cache, capacity=capacity, channels=3)
            return out["image"], out["overflow"]
        img, ovf = f(params, 0.0)
        return np.asarray(img), int(ovf)

    img_cap, ovf_cap = render_once(CAP)
    img_ref, ovf_ref = render_once(4096)
    dd = np.abs(img_cap - img_ref)
    cap_maxdiff = float(dd.max())
    cap_badpx = float((dd > 1.0 / 255.0).mean())
    from dimo_tpu.ops.rasterizer import strips as strips_mod
    from dimo_tpu.ops.rasterizer import composite_strips as cs_mod
    from dimo_tpu.ops.rasterizer import tiles as tiles_mod
    print(json.dumps({
        "metric": "render_fps_512_s2_100k",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS_A100, 3),
        "fps_ch7": round(fps7, 2),
        "fps_cap512": round(fps_cap512, 2),
        "capacity": CAP,
        # on-chip convergence evidence for `capacity` (vs cap4096 render)
        "cap_maxdiff_vs4096": round(cap_maxdiff, 5),
        "cap_badpx_gt_1_255": round(cap_badpx, 6),
        "overflow_at_cap": ovf_cap,
        "overflow_at_4096": ovf_ref,
        "scene": f"shell-v2-{scene_hash}",
        # compositor variant that produced this number (A/B knobs)
        "s_per_buf": strips_mod.S_PER_BUF,
        "y_repeat": cs_mod.Y_REPEAT,
        "fwd_inloop": cs_mod.FWD_INLOOP,
        "strip_w": strips_mod.STRIP_W,
        "dup": strips_mod.DUP,
        "tier2": tiles_mod.TIER2,
        "windma": tiles_mod.WINDMA,
        **check,
    }))


if __name__ == "__main__":
    main()
