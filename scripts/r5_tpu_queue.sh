#!/bin/bash
# Round-5 TPU queue 1 — 128^3 record (warm build), smoke budget, MG x Pallas bisect.
cd /root/repo || exit 1
mkdir -p results
log=results/r5_tpu_queue.jsonl
err=/tmp/r5_queue_err.txt

leg() {
  local tmo="$1"; shift
  echo "[queue $(date +%H:%M:%S)] $*" >> "$err"
  timeout "$tmo" python "$@" 2>>"$err" | grep '^{' >> "$log"
  echo "[queue $(date +%H:%M:%S)] rc=$? done: $*" >> "$err"
}

leg 5400 scripts/bench_mg_solve.py --res 128
leg 1800 scripts/bench_smoke.py --update-budget --out results/r5_smoke.jsonl
leg 2400 scripts/bisect_mg_pallas.py --res 32
leg 3600 scripts/bisect_mg_pallas.py --res 64
echo "[queue $(date +%H:%M:%S)] ALL DONE" >> "$err"
