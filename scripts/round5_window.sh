#!/bin/bash
# Round-5 chip plan (run pieces in THIS order; one TPU process at a time):
#
#   1. FIRST: run the scale512 eval FROM SCRATCH (the round-4 snapshots
#      at s2 step ~7800 were untracked and are GONE — the driver wipes
#      untracked files between rounds; budget ~3h for 2800+10000 steps):
#        timeout 14400 python -u scripts/eval_quality.py --scale512 \
#          --no-lpips --snapshot-every 250 --out eval_quality.json
#      Snapshots land under runs/eval_quality/snap_*/ (NOT gitignored) —
#      `git add runs/ && git commit` every few snapshots while it runs.
#      (--no-lpips is deliberate: round-4 A/B proved the random-VGG
#      fallback quality-neutral at ~2x step cost; steps 0-500 of s2 ran
#      with it before the switch — documented in PARITY.)
#      Then commit eval_quality.json + refresh README/PARITY quality rows.
#
#   2. Knob probes on the QUIET chip (fresh kernel shapes can compile
#      >7 min; budget 800s each). 2026-08-19 CPU audits predict TIER2=5
#      skips the big path entirely on the flagship (1229 mediums, 0
#      giants) and WINDMA replaces the 1.2 ms window gather with 256
#      contiguous DMAs:
#        bash scripts/round5_window.sh probes
#
#   3. Train-step decomposition (VERDICT #3 prerequisite):
#        timeout 1800 python -u scripts/profile_train.py
#        timeout 1800 python -u scripts/profile_grad_parts.py
#
#   4. cap4096 device-fault bisection (VERDICT r4 #2; ~10 min/combo):
#        python -u scripts/bisect_cap4096.py --iters 40,60          # repro
#        python -u scripts/bisect_cap4096.py --matrix --iters 40,60 # bisect
#
#   5. Flip any winning defaults, rerun CPU oracle tests, commit, and
#      re-run `python bench.py` once at the end for the round evidence.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r5_probes}
mkdir -p "$LOG"

probe() {
  local name=$1; shift
  echo "== $name"
  timeout 800 env "$@" python -u scripts/fps_probe.py 300 1024 3 \
    2>&1 | tail -1 | tee "$LOG/$name.txt"
}

if [ "${1:-}" = "probes" ]; then
  probe base
  probe tier2        DIMO_TIER2=5
  probe windma       DIMO_WINDMA=1
  probe windma8      DIMO_WINDMA=8
  probe tier2_windma DIMO_TIER2=5 DIMO_WINDMA=8
  # grad-mode re-check of the bwd chunk knob on a quiet chip
  timeout 900 env PROBE_GRAD=1 python -u scripts/fps_probe.py 100 1024 3 \
    2>&1 | tail -1 | tee "$LOG/grad_base.txt"
  timeout 900 env PROBE_GRAD=1 DIMO_SG_BWD=64 python -u scripts/fps_probe.py 100 1024 3 \
    2>&1 | tail -1 | tee "$LOG/grad_sg64.txt"
fi
