#!/bin/bash
# Round-5 post-eval chip queue: runs the moment the scale512 eval rerun
# releases the chip. Ordered by artifact value in case the round ends
# mid-queue (commits after every phase; untracked files do not survive
# rounds):
#   1. bench.py at the new defaults (TIER2=5/SG_BWD=64/INLOOP=1) — the
#      round-4 attempt died at a 1200s timeout mid-compile; fresh kernel
#      shapes through the tunnel can take >20 min, hence 2400s.
#   2. train-step throughput re-measure (sequential render mapping +
#      device-resident batch landed since train_bench.json's 1875 ms).
#   3. WINDMA on-chip probe with FULL log capture (the 2026-08-20 probes
#      lost the Mosaic traceback to a tail-3 capture).
#   4. cap4096 bisect matrix, one kernel combo per process, most
#      informative first (all-interpret already survives => Pallas).
# ONE chip process at a time; each phase fully owns the chip.
set -u
cd /root/repo
OUT=/root/repo/probes_r5
note() { echo "$(date +%H:%M:%S) $*" >> "$OUT/postchip.log"; }
save() {
  git add "$OUT" *.json 2>/dev/null
  git commit -q -m "$1" 2>/dev/null && note "committed: $1"
}

note "postchip queue start"

note "bench start"
timeout 2400 python -u bench.py > "$OUT/bench_r5_final.txt" 2>&1
note "bench exit=$?"
save "round5 postchip: bench at final defaults"

note "train_bench start"
timeout 2000 python -u scripts/bench_train.py > "$OUT/train_bench_r5.txt" 2>&1
note "train_bench exit=$?"
save "round5 postchip: train-step throughput at sequential mapping"

note "windma probe start"
DIMO_WINDMA=8 timeout 1200 python -u scripts/fps_probe.py 300 1024 3 \
  > "$OUT/windma_vmemdst.txt" 2>&1
note "windma probe exit=$?"
save "round5 postchip: WINDMA VMEM-dest on-chip probe"

for combo in sbwd sfwd,sbwd sgfwd,sgbwd; do
  tag=$(echo "$combo" | tr ', ' '__')
  note "bisect $combo start"
  DIMO_FORCE_INTERPRET=$combo timeout 1500 python -u \
    scripts/bisect_cap4096.py --iters 40,60 \
    > "$OUT/bisect_$tag.txt" 2>&1
  note "bisect $combo exit=$?"
  save "round5 postchip: cap4096 bisect $combo"
done

note "postchip queue done"
save "round5 postchip: final artifacts"
