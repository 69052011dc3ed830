#!/bin/bash
# Round-5 guarded scale512 rerun babysitter (detached; survives session
# crashes). The first scale512 run NaN-diverged in s2 (eval_quality.json
# 11.64 dB was "render == background"); this rerun
#   - reuses the run's CLEAN committed s1 checkpoint (--load-stage s1),
#   - runs a 6000-step s2 (fits the remaining round window at the measured
#     ~1.7-2.2 s/step; the tag isolates its snapshots),
#   - trains under the new step.py non-finite-grad guard ([guard] lines in
#     the log pinpoint any recurrence instead of poisoning the state),
#   - commits snapshots + the final artifact so NOTHING is lost when the
#     round ends (untracked files do not survive rounds — round-5 fact).
# After the eval releases the chip it runs the orchestrator's missing
# phases: cap4096 bisection repro + bench snapshot.
set -u
cd /root/repo
OUT=/root/repo/probes_r5
LOG=/tmp/eval512_rerun.log
note() { echo "$(date +%H:%M:%S) $*" >> "$OUT/babysit2.log"; }

# wait for any current chip job (knob probe) to exit
while pgrep -f fps_probe.py >/dev/null 2>&1; do sleep 30; done
note "chip free; starting guarded scale512 rerun"

launch() {
  nohup python -u scripts/eval_quality.py --scale512 --no-lpips \
    --load-stage s1 --iters 2800,6000 --snapshot-every 250 \
    --out eval_quality_r5.json > "$LOG" 2>&1 &
  echo $! > /tmp/eval512_rerun.pid
  note "launched eval rerun pid $(cat /tmp/eval512_rerun.pid)"
}
launch

# babysit: commit progress every ~10 min; relaunch on death (snapshot
# resume) unless the artifact exists; stop at the wall-clock deadline
DEADLINE=$(( $(date +%s) + 5*3600 ))
while true; do
  sleep 600
  git add runs/eval_quality eval_quality_r5.json "$OUT" 2>/dev/null
  git commit -q -m "eval rerun snapshot autosave" 2>/dev/null && \
    note "autosave commit"
  if [ -f eval_quality_r5.json ]; then
    note "rerun artifact present; done"
    git add eval_quality_r5.json runs/eval_quality 2>/dev/null
    git commit -q -m "scale512 guarded rerun: final quality artifact" \
      2>/dev/null
    break
  fi
  if ! kill -0 "$(cat /tmp/eval512_rerun.pid)" 2>/dev/null; then
    note "eval died; relaunching (snapshot resume)"
    launch
  fi
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    note "deadline; leaving the run to the final-commit sweep"
    break
  fi
done

# ---- post-eval chip window: missing orchestrator phases ---------------
while kill -0 "$(cat /tmp/eval512_rerun.pid)" 2>/dev/null; do sleep 60; done
note "bisect repro start"
timeout 1500 python -u scripts/bisect_cap4096.py --iters 40,60 \
  > "$OUT/bisect_repro.txt" 2>&1
note "bisect repro exit=$?"
note "bench start"
timeout 1200 python -u bench.py > "$OUT/bench_r5_self.txt" 2>&1
git add "$OUT" 2>/dev/null
git commit -q -m "round5: cap4096 repro + bench snapshot artifacts" \
  -- "$OUT" 2>/dev/null && note "committed post-eval artifacts"
note "babysitter done"
