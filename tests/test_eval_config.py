"""Wiring tests for the eval_quality gate configs (scripts/eval_quality.py).

The --scale512 run costs hours on TPU, so its config assembly is pinned
here: shape, schedule, and gaussian-count invariants for every mode combo.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from eval_quality import build_config  # noqa: E402


class TestEvalQualityConfig:
    def test_default(self):
        M, V, F, S, s1, s2, opt = build_config()
        assert (M, S) == (3, 256) and (s1, s2) == (700, 500)
        assert opt.num_cpts * opt.num_pts_per_cpt == 12288
        assert opt.ref_size == opt.W == opt.H == S
        assert (opt.iters_s1, opt.iters_s2) == (s1, s2)

    def test_fast(self):
        _, _, _, _, s1, s2, opt = build_config(fast=True)
        assert (s1, s2) == (120, 60)

    def test_scale512(self):
        M, V, F, S, s1, s2, opt = build_config(scale512=True)
        assert (M, S) == (8, 512)
        assert (s1, s2) == (2800, 10000)                 # full schedule
        assert opt.num_cpts * opt.num_pts_per_cpt == 51200
        assert opt.tile_capacity == 1024
        assert opt.ref_size == opt.W == opt.H == 512
        # densify window must sit inside stage 1
        assert opt.density_end_iter <= s1
        assert opt.arap_end_iter_s2 <= s2

    def test_iters_override(self):
        _, _, _, _, s1, s2, opt = build_config(scale512=True, iters="10,20")
        assert (s1, s2) == (10, 20)
        assert (opt.iters_s1, opt.iters_s2) == (10, 20)
