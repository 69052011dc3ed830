#!/bin/bash
# Round-5 detached chip-window orchestrator.
#
# Sessions this round keep dying to API overload; chip time must not die
# with them. Run detached (nohup setsid bash scripts/r5_orchestrator.sh &)
# once the scale512 eval owns the chip. It:
#   0. waits for the eval to finish (eval_quality.json committed by the
#      babysitter, or the eval dying without relaunch),
#   1. runs the fwd knob probes (TIER2 / WINDMA burst / combo),
#   2. runs the grad-mode probes (base vs DIMO_SG_BWD=64),
#   3. runs the train-step decomposition profiles,
#   4. runs the cap4096 bisection repro (+ the all-interpret combo),
#   5. re-runs bench.py for a round-evidence snapshot,
# committing artifacts under probes_r5/ after every phase. ONE TPU process
# at a time is a hard environment rule — this script is the only chip user
# once the eval is done; do not start manual chip jobs while it runs.
#
# Default flips stay a HUMAN decision: this script only gathers evidence.
set -u
cd /root/repo
OUT=/root/repo/probes_r5
mkdir -p "$OUT"
note() { echo "$(date +%H:%M:%S) $*" >> "$OUT/orchestrator.log"; }
save() {  # save <msg> -- commit whatever landed in probes_r5/
  git add "$OUT" 2>/dev/null
  git commit -q -m "$1" -- "$OUT" 2>/dev/null && note "committed: $1"
}

note "orchestrator up (pid $$)"

# ---- phase 0: wait for the eval to release the chip ------------------
while true; do
  if [ -f eval_quality.json ] && grep -q '"scale512": true' eval_quality.json; then
    note "eval artifact present"
    break
  fi
  if ! kill -0 "$(cat /tmp/eval512.pid 2>/dev/null)" 2>/dev/null; then
    # the babysitter relaunches within ~120s of a death; give it 360s
    sleep 360
    if ! kill -0 "$(cat /tmp/eval512.pid 2>/dev/null)" 2>/dev/null \
       && ! { [ -f eval_quality.json ] && grep -q '"scale512": true' eval_quality.json; }; then
      note "eval dead and not relaunched -- taking the chip window anyway"
      break
    fi
    continue
  fi
  sleep 60
done
sleep 90   # let the eval process fully exit / chip free up

# ---- phase 1: fwd knob probes (>=800s: fresh kernel shapes compile >7min)
probe() {
  local name=$1; shift
  note "probe $name start"
  timeout 900 env "$@" python -u scripts/fps_probe.py 300 1024 3 \
    > "$OUT/$name.txt" 2>&1
  note "probe $name done: $(tail -1 "$OUT/$name.txt")"
}
probe base
probe tier2        DIMO_TIER2=5
probe windma8      DIMO_WINDMA=8
probe tier2_windma DIMO_TIER2=5 DIMO_WINDMA=8
save "round5 chip window: fwd knob probes (TIER2/WINDMA)"

# ---- phase 2: grad-mode probes ---------------------------------------
note "grad probes start"
timeout 900 env PROBE_GRAD=1 python -u scripts/fps_probe.py 100 1024 3 \
  > "$OUT/grad_base.txt" 2>&1
timeout 900 env PROBE_GRAD=1 DIMO_SG_BWD=64 python -u scripts/fps_probe.py 100 1024 3 \
  > "$OUT/grad_sg64.txt" 2>&1
save "round5 chip window: grad probes (SG_BWD)"

# ---- phase 3: train-step decomposition (VERDICT r4 #4) ----------------
note "profile_train start"
timeout 1800 python -u scripts/profile_train.py > "$OUT/profile_train.txt" 2>&1
note "profile_grad_parts start"
timeout 1800 python -u scripts/profile_grad_parts.py > "$OUT/profile_grad_parts.txt" 2>&1
save "round5 chip window: train-step decomposition artifacts"

# ---- phase 4: cap4096 fault repro + first bisection combo -------------
note "bisect repro start"
timeout 1500 python -u scripts/bisect_cap4096.py --iters 40,60 \
  > "$OUT/bisect_repro.txt" 2>&1
note "bisect repro exit=$?"
# the all-interpret combo splits Pallas-vs-XLA in one extra run
timeout 1500 env DIMO_FORCE_INTERPRET=all python -u scripts/bisect_cap4096.py \
  --iters 40,60 > "$OUT/bisect_all_interpret.txt" 2>&1
note "bisect all-interpret exit=$?"
save "round5 chip window: cap4096 bisection artifacts"

# ---- phase 5: bench snapshot ------------------------------------------
note "bench start"
timeout 1200 python -u bench.py > "$OUT/bench_r5_self.txt" 2>&1
save "round5 chip window: bench snapshot"
note "orchestrator done"
