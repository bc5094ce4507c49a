#!/bin/bash
# Round-4 TPU queue 2 — settled code (flat state + dual-impl weights +
# slab SpMV). Queue-1 postmortem: legs 4-6 imported a mid-refactor tree
# (code skew) and the 64^3 jacobi leg measured the all-flat tensor_weights
# regression (0.444 steps/s); this queue re-runs everything on one tree.
cd /root/repo || exit 1
mkdir -p results
log=results/r4_tpu_queue2.jsonl
err=/tmp/r4_queue2_err.txt

leg() {
  local tmo="$1"; shift
  echo "[queue2 $(date +%H:%M:%S)] $*" >> "$err"
  timeout "$tmo" python "$@" 2>>"$err" | grep '^{' | tail -1 >> "$log"
  echo "[queue2 $(date +%H:%M:%S)] rc=$? done: $*" >> "$err"
}

leg 300  scripts/probe_state_layout.py
leg 1800 scripts/bench_mg_ab.py --one jacobi --res 64 --steps 5
leg 2700 scripts/bench_mg_ab.py --one mg_asm --res 64 --steps 5 --refresh step
leg 4500 scripts/bench_mg_ab.py --one mg_asm --res 128 --steps 3 --refresh step
leg 2700 scripts/bench_mg_ab.py --one mg_asm1 --res 64 --steps 5 --refresh step
leg 4500 scripts/bench_mg_ab.py --one mg_asm1 --res 128 --steps 3 --refresh step
leg 2700 scripts/bench_mg_build.py
echo "[queue2 $(date +%H:%M:%S)] ALL DONE" >> "$err"
