#!/bin/bash
# Round-5 guarded scale512 rerun babysitter, v2 (detached; survives session
# crashes). v1 only relaunched on DEATH; the axon tunnel's 2026-08-20
# flapping instead leaves clients HUNG forever at boot (no device dial, ~0
# CPU), so v2 adds:
#   - a progress watchdog: no snapshot/log growth for STALL_MIN minutes
#     => SIGTERM + quiet wait + relaunch;
#   - a pre-launch gate: a 60s matmul probe must succeed (launches only
#     inside a good tunnel window);
#   - autosave commits of snapshots/artifacts every loop (untracked files
#     do not survive rounds).
# After the eval completes it runs the leftover orchestrator phases
# (cap4096 repro, bench snapshot).
set -u
cd /root/repo
OUT=/root/repo/probes_r5
LOG=/tmp/eval512_rerun.log
SNAP=runs/eval_quality/snap_512_2800+6000_nolpips/snapshot_meta.json
STALL_MIN=15
note() { echo "$(date +%H:%M:%S) $*" >> "$OUT/babysit2.log"; }

probe_ok() {
  timeout 60 python -c "import jax, jax.numpy as jnp
x = jnp.ones((64,64)) @ jnp.ones((64,64)); x.block_until_ready()
print('OK')" 2>/dev/null | grep -q OK
}

launch() {
  # gate on a live tunnel window; probe at most ~10 min
  for i in 1 2 3 4 5 6 7 8; do
    if probe_ok; then break; fi
    note "probe hung (tunnel window closed); waiting"
    sleep 60
  done
  nohup python -u scripts/eval_quality.py --scale512 --no-lpips \
    --load-stage s1 --iters 2800,6000 --snapshot-every 250 \
    --out eval_quality_r5.json >> "$LOG" 2>&1 &
  echo $! > /tmp/eval512_rerun.pid
  note "launched eval rerun pid $(cat /tmp/eval512_rerun.pid)"
  touch /tmp/eval512_progress_stamp
}

progress_sig() {
  # snapshot meta mtime + log byte count: either moves while training
  echo "$(stat -c %Y "$SNAP" 2>/dev/null || echo 0):$(stat -c %s "$LOG" 2>/dev/null || echo 0)"
}

relaunch_after_quiet() {
  kill "$(cat /tmp/eval512_rerun.pid)" 2>/dev/null
  sleep 20
  kill -9 "$(cat /tmp/eval512_rerun.pid)" 2>/dev/null
  note "stalled/hung eval killed; 180s quiet window"
  sleep 180
  launch
}

[ -f /tmp/eval512_rerun.pid ] && kill -0 "$(cat /tmp/eval512_rerun.pid)" \
  2>/dev/null || launch
LAST_SIG=$(progress_sig)
LAST_CHANGE=$(date +%s)
DEADLINE=$(( $(date +%s) + 4*3600 ))

while true; do
  sleep 300
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
  SIG=$(progress_sig)
  NOW=$(date +%s)
  if [ "$SIG" != "$LAST_SIG" ]; then
    LAST_SIG=$SIG; LAST_CHANGE=$NOW
  fi
  if ! kill -0 "$(cat /tmp/eval512_rerun.pid)" 2>/dev/null; then
    note "eval died; relaunching (snapshot resume)"
    launch; LAST_CHANGE=$(date +%s)
  elif [ $(( NOW - LAST_CHANGE )) -gt $(( STALL_MIN * 60 )) ]; then
    note "no progress for ${STALL_MIN}m; recycling the eval"
    relaunch_after_quiet; LAST_CHANGE=$(date +%s)
  fi
  if [ "$NOW" -gt "$DEADLINE" ]; then
    note "deadline; leaving the run to the final-commit sweep"
    break
  fi
done

while kill -0 "$(cat /tmp/eval512_rerun.pid)" 2>/dev/null; do sleep 60; done
note "eval released the chip; running the postchip queue"
bash scripts/r5_postchip.sh
note "babysitter done"
