#!/bin/bash
# Round-5 TPU queue 2 — 64^3 build-lever A/B, 256^3 config-5 attempt,
# full driver bench preview.
cd /root/repo || exit 1
mkdir -p results
log=results/r5_tpu_queue2.jsonl
err=/tmp/r5_queue2_err.txt

leg() {
  local tmo="$1"; shift
  echo "[queue2 $(date +%H:%M:%S)] $*" >> "$err"
  timeout "$tmo" python "$@" 2>>"$err" | grep '^{' >> "$log"
  echo "[queue2 $(date +%H:%M:%S)] rc=$? done: $*" >> "$err"
}

leg 2700 scripts/bench_mg_ab.py --one jacobi --res 64 --steps 5 --pregrow 1.3
leg 3600 scripts/bench_mg_ab.py --one mg_asm --res 64 --steps 5 --refresh step --pregrow 1.3
leg 3600 scripts/bench_mg_ab.py --one mg_asm --res 64 --steps 5 --rap-refresh lagged --pregrow 1.3
leg 3600 scripts/bench_mg_ab.py --one mg_asm --res 64 --steps 5 --rap-refresh lagged --rap-max-half 3 --pregrow 1.3
leg 5400 scripts/bench_mg_solve.py --res 256 --ppc 8
echo "[queue2 $(date +%H:%M:%S)] ALL DONE" >> "$err"
