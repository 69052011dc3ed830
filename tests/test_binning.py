"""Brute-force ground truth for the duplicate-key bin binning (tiles.py).

The end-to-end rasterizer tests cover binning only through composited
images; this pins the list-construction contract directly: per-bin
membership, depth ordering, exact totals, overflow accounting, and
nearest-`capacity` truncation — against an O(N*T) numpy oracle.
Reference contract: the CUDA duplicate+radix-sort binning
(/root/reference/renderer/latent_gs_renderer.py:1255-1277 call sites).
"""
import numpy as np
import jax.numpy as jnp

from dimo_tpu.ops.rasterizer import tiles as T


def _brute_bins(mean2d, radius, depth, ok, nrows, ncols, bin_h, bin_w):
    """Per-bin gaussian index lists ordered by quantized depth (numpy)."""
    n = len(depth)
    cmin = np.floor((mean2d[:, 0] - radius) / bin_w).astype(int)
    cmax = np.floor((mean2d[:, 0] + radius) / bin_w).astype(int)
    rmin = np.floor((mean2d[:, 1] - radius) / bin_h).astype(int)
    rmax = np.floor((mean2d[:, 1] + radius) / bin_h).astype(int)
    on = (cmax >= 0) & (cmin <= ncols - 1) & (rmax >= 0) & (rmin <= nrows - 1)
    alive = ok & (radius > 0) & on
    cmin, cmax = np.clip(cmin, 0, ncols - 1), np.clip(cmax, 0, ncols - 1)
    rmin, rmax = np.clip(rmin, 0, nrows - 1), np.clip(rmax, 0, nrows - 1)
    # reproduce _quantize_depth (adaptive depth bits per bin count)
    depth_max = (1 << T._depth_bits_for(nrows * ncols)) - 1
    d = np.where(alive, depth, 0.0)
    lo = d.min()
    hi = np.where(alive, depth, -np.inf).max()
    hi = hi if np.isfinite(hi) else lo + 1.0
    scale = depth_max / max(hi - lo, 1e-6)
    dq = np.clip((depth - lo) * scale, 0, depth_max).astype(np.int64)
    out = {}
    for tr in range(nrows):
        for tc in range(ncols):
            members = [g for g in range(n) if alive[g]
                       and rmin[g] <= tr <= rmax[g]
                       and cmin[g] <= tc <= cmax[g]]
            members.sort(key=lambda g: dq[g])
            out[tr * ncols + tc] = (members, dq)
    return out


def _scene(rng, n, extent, rad_lo, rad_hi, distinct_depth=True):
    mean2d = rng.uniform(-20, extent + 20, (n, 2)).astype(np.float32)
    radius = rng.uniform(rad_lo, rad_hi, n).astype(np.float32)
    if distinct_depth:  # distinct quantized keys -> unambiguous order
        depth = (rng.permutation(n).astype(np.float32) + 1.0) * 0.37
    else:
        depth = rng.uniform(1.0, 5.0, n).astype(np.float32)
    ok = rng.uniform(size=n) > 0.1
    radius[rng.uniform(size=n) < 0.05] = 0.0   # dead-radius slots
    return mean2d, radius, depth, ok


def _run(mean2d, radius, depth, ok, nrows, ncols, bin_h, bin_w, cap,
         **kw):
    lists = T.build_bin_lists(jnp.asarray(mean2d), jnp.asarray(radius),
                              jnp.asarray(depth), jnp.asarray(ok),
                              nrows, ncols, bin_h, bin_w, cap, **kw)
    return (np.asarray(lists.idx), np.asarray(lists.count),
            int(lists.overflow), int(lists.overflow_max))


class TestBinListsBruteForce:
    def test_membership_order_counts(self):
        rng = np.random.RandomState(0)
        nrows, ncols, bh, bw = 4, 6, 32, 32
        n, cap = 300, 128
        mean2d, radius, depth, ok = _scene(rng, n, max(ncols * bw, nrows * bh),
                                           1.0, 20.0)
        idx, count, overflow, ovmax = _run(mean2d, radius, depth, ok,
                                           nrows, ncols, bh, bw, cap)
        brute = _brute_bins(mean2d, radius, depth, ok, nrows, ncols, bh, bw)
        total_drop = 0
        max_drop = 0
        for t, (members, dq) in brute.items():
            got = list(idx[t][:count[t]])
            assert count[t] == min(len(members), cap), (t, count[t],
                                                        len(members))
            assert all(g < n for g in got)
            # nearest-`capacity` truncation: the kept entries are exactly
            # the capacity depth-smallest members, in depth order
            expect = members[:cap]
            assert sorted(got) == sorted(expect), (t, got, expect)
            assert [dq[g] for g in got] == sorted(dq[g] for g in got), t
            total_drop += max(len(members) - cap, 0)
            max_drop = max(max_drop, len(members) - cap)
        assert overflow == total_drop
        assert ovmax == max_drop

    def test_big_path_and_mixed(self):
        rng = np.random.RandomState(1)
        nrows, ncols, bh, bw = 3, 4, 32, 128
        n, cap = 200, 64
        mean2d, radius, depth, ok = _scene(rng, n, 512, 2.0, 8.0)
        # a handful of oversized gaussians spanning many bins (big path)
        for g in range(0, 200, 40):
            radius[g] = rng.uniform(80, 200)
        idx, count, overflow, _ovm = _run(mean2d, radius, depth, ok,
                                    nrows, ncols, bh, bw, cap)
        brute = _brute_bins(mean2d, radius, depth, ok, nrows, ncols, bh, bw)
        for t, (members, dq) in brute.items():
            got = list(idx[t][:count[t]])
            assert sorted(got) == sorted(members[:cap]), t
            assert [dq[g] for g in got] == sorted(dq[g] for g in got), t

    def test_all_dead_and_offscreen(self):
        nrows, ncols, bh, bw = 2, 2, 32, 32
        n = 16
        mean2d = np.full((n, 2), -500.0, np.float32)   # far off-screen
        radius = np.ones(n, np.float32)
        depth = np.arange(1, n + 1, dtype=np.float32)
        ok = np.ones(n, bool)
        idx, count, overflow, _ovm = _run(mean2d, radius, depth, ok,
                                    nrows, ncols, bh, bw, 8)
        assert count.sum() == 0 and overflow == 0
        assert (idx == n).all()

    def test_beyond_512_bins(self):
        """>512 bins (e.g. 1024x1024 images under 32x32 strips) exercise the
        ADAPTIVE key split: bin ids spill past the round-2 fixed 22-bit
        depth field, which capped images at 512 bins — the CUDA reference
        has no such limit."""
        rng = np.random.RandomState(3)
        nrows, ncols, bh, bw = 32, 32, 32, 32          # 1024 bins
        n, cap = 200, 32
        mean2d, radius, depth, ok = _scene(rng, n, 1024, 2.0, 24.0)
        idx, count, overflow, _ovm = _run(mean2d, radius, depth, ok,
                                    nrows, ncols, bh, bw, cap)
        brute = _brute_bins(mean2d, radius, depth, ok, nrows, ncols, bh, bw)
        total_drop = 0
        for t, (members, dq) in brute.items():
            got = list(idx[t][:count[t]])
            assert sorted(got) == sorted(members[:cap]), t
            assert [dq[g] for g in got] == sorted(dq[g] for g in got), t
            total_drop += max(len(members) - cap, 0)
        assert overflow == total_drop

    def test_3x3_footprint_oracle(self):
        """DIMO_DUP=3 (strips.py): kr=kc=3 keeps radii <32px on the small
        path at 32x32 bins. Same oracle contract — membership, depth order,
        exact totals — for a scene whose 16-32px radii rode the big path
        at the default 2x2 footprint, plus a few genuinely big (>32px)
        gaussians so the big path still merges correctly under kr=kc=3."""
        rng = np.random.RandomState(7)
        nrows, ncols, bh, bw = 6, 6, 32, 32
        n, cap = 300, 96
        mean2d, radius, depth, ok = _scene(rng, n, 192, 1.0, 30.0)
        for g in range(0, n, 60):                       # >32px: big path
            radius[g] = rng.uniform(40, 120)
        for kwargs in ({"kr": 3, "kc": 3},):
            idx, count, overflow, _ovm = _run(mean2d, radius, depth, ok,
                                        nrows, ncols, bh, bw, cap, **kwargs)
            brute = _brute_bins(mean2d, radius, depth, ok, nrows, ncols,
                                bh, bw)
            total_drop = 0
            for t, (members, dq) in brute.items():
                got = list(idx[t][:count[t]])
                assert count[t] == min(len(members), cap), t
                assert sorted(got) == sorted(members[:cap]), t
                assert [dq[g] for g in got] == sorted(dq[g] for g in got), t
                total_drop += max(len(members) - cap, 0)
            assert overflow == total_drop

    def test_tier2_medium_tier_oracle(self, monkeypatch):
        """DIMO_TIER2=5 (tiles.py): mediums (footprint <= 5x5) are
        compacted by depth top_k and ride the global pair sort; only
        giants beyond 5x5 take the big-path merge. Same oracle contract
        on a scene mixing small (<16px), medium (16-64px), and giant
        (>64px) radii at 32x32 bins."""
        monkeypatch.setattr(T, "TIER2", 5)
        rng = np.random.RandomState(11)
        nrows, ncols, bh, bw = 6, 6, 32, 32
        n, cap = 300, 96
        mean2d, radius, depth, ok = _scene(rng, n, 192, 1.0, 14.0)
        for g in range(0, n, 10):                       # medium tier
            radius[g] = rng.uniform(17, 62)
        for g in range(0, n, 75):                       # giants: big path
            radius[g] = rng.uniform(70, 150)
        idx, count, overflow, _ovm = _run(mean2d, radius, depth, ok,
                                    nrows, ncols, bh, bw, cap)
        brute = _brute_bins(mean2d, radius, depth, ok, nrows, ncols, bh, bw)
        total_drop = 0
        for t, (members, dq) in brute.items():
            got = list(idx[t][:count[t]])
            assert count[t] == min(len(members), cap), t
            assert sorted(got) == sorted(members[:cap]), t
            assert [dq[g] for g in got] == sorted(dq[g] for g in got), t
            total_drop += max(len(members) - cap, 0)
        assert overflow == total_drop

    def test_windma_readout_matches_gather(self, monkeypatch):
        """DIMO_WINDMA=1 (windowdma.py): the per-bin contiguous DMA window
        readout must be row-for-row identical to the XLA gather route on
        the same scene (interpret mode on CPU), including capacity
        truncation and overflowing windows near the array end."""
        monkeypatch.setattr(T, "WINDMA", 0)
        rng = np.random.RandomState(13)
        nrows, ncols, bh, bw = 4, 6, 32, 32
        n, cap = 300, 64
        mean2d, radius, depth, ok = _scene(rng, n, 192, 1.0, 20.0)
        ref = _run(mean2d, radius, depth, ok, nrows, ncols, bh, bw, cap)
        # nburst=1 (serial start->wait), 8 (in-flight burst; 24 bins is
        # not a multiple of 8? 4*6=24 => pad-free), 7 (forces grid padding)
        for burst in (1, 8, 7):
            monkeypatch.setattr(T, "WINDMA", burst)
            got = _run(mean2d, radius, depth, ok, nrows, ncols, bh, bw, cap)
            assert (got[0] == ref[0]).all(), burst
            assert (got[1] == ref[1]).all(), burst
            assert got[2] == ref[2], burst

    def test_duplicate_depth_keys_keep_membership(self):
        # colliding quantized depths: order within ties is unspecified,
        # membership and counts must still be exact
        rng = np.random.RandomState(2)
        nrows, ncols, bh, bw = 4, 4, 32, 32
        n, cap = 256, 64
        mean2d, radius, depth, ok = _scene(rng, n, 128, 1.0, 10.0,
                                           distinct_depth=False)
        depth[:] = np.repeat(depth[:64], 4)            # heavy ties
        idx, count, overflow, _ovm = _run(mean2d, radius, depth, ok,
                                    nrows, ncols, bh, bw, cap)
        brute = _brute_bins(mean2d, radius, depth, ok, nrows, ncols, bh, bw)
        for t, (members, dq) in brute.items():
            if len(members) <= cap:                     # no tie-truncation
                got = list(idx[t][:count[t]])
                assert sorted(got) == sorted(members), t
