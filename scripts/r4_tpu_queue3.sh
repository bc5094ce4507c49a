#!/bin/bash
# Round-4 TPU queue 3 — flat BSR vals + one-gather slab SpMV + graded
# warm ramp + pregrow. Queue-2 postmortem: mg_asm 128^3 down to 980 MB
# over (flat vals kills the last 13.27 GB reshape-merge copy), mg_asm1
# 128^3 OOM'd in the composed mass scatter (scalar scatter fix), vcycle
# 513 ms regression from d separate gathers in the slab SpMV (one-gather
# fix), 64^3 legs died on full-dt warm inside the re-opt window (ramp).
cd /root/repo || exit 1
mkdir -p results
log=results/r4_tpu_queue3.jsonl
err=/tmp/r4_queue3_err.txt

leg() {
  local tmo="$1"; shift
  echo "[queue3 $(date +%H:%M:%S)] $*" >> "$err"
  timeout "$tmo" python "$@" 2>>"$err" | grep '^{' | tail -1 >> "$log"
  echo "[queue3 $(date +%H:%M:%S)] rc=$? done: $*" >> "$err"
}

leg 600  scripts/probe_state_layout.py
leg 2700 scripts/bench_mg_build.py
leg 2700 scripts/bench_mg_ab.py --one jacobi --res 64 --steps 5 --pregrow 1.3
leg 3600 scripts/bench_mg_ab.py --one mg_asm --res 64 --steps 5 --refresh step --pregrow 1.3
leg 5400 scripts/bench_mg_ab.py --one mg_asm --res 128 --steps 3 --refresh step --pregrow 1.3
leg 3600 scripts/bench_mg_ab.py --one mg_asm1 --res 64 --steps 5 --refresh step --pregrow 1.3
leg 5400 scripts/bench_mg_ab.py --one mg_asm1 --res 128 --steps 3 --refresh step --pregrow 1.3
echo "[queue3 $(date +%H:%M:%S)] ALL DONE" >> "$err"
