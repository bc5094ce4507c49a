#!/bin/bash
# Round-4 TPU measurement queue — runs each leg SOLO, sequentially
# (one TPU process at a time; the compile helper runs on this host).
# Every leg appends its one JSON line to results/r4_tpu_queue.jsonl.
#
# Legs (VERDICT r3 items 1, 2, 4):
#   1. jacobi 64^3      — production-path regression check after the flat
#                         tensor_weights rewrite (record: 0.767 steps/s)
#   2. mg_asm 128^3     — THE north-star crossover A/B (round-3 cliffhanger;
#                         jacobi 128^3 was 0.0535 steps/s at 5/49)
#   3. jacobi 128^3     — re-record under the same code
#   4. mg_asm 64^3 lag  — refresh=step baseline (round-3: 0.222-0.242)
#   5. mg_asm1 64^3 lag — matrix-free finest + composed Galerkin from l1
#                         (skips assemble_l0 = half the build)
#   6. bench_mg_build   — assemble_l0 post-flat-rewrite decomposition
cd /root/repo || exit 1
mkdir -p results
log=results/r4_tpu_queue.jsonl
err=/tmp/r4_queue_err.txt

leg() {
  local tmo="$1"; shift
  echo "[queue $(date +%H:%M:%S)] $*" >> "$err"
  timeout "$tmo" python "$@" 2>>"$err" | grep '^{' | tail -1 >> "$log"
  echo "[queue $(date +%H:%M:%S)] rc=$? done: $*" >> "$err"
}

leg 1800 scripts/bench_mg_ab.py --one jacobi --res 64 --steps 5
leg 4500 scripts/bench_mg_ab.py --one mg_asm --res 128 --steps 3 --refresh step
leg 2700 scripts/bench_mg_ab.py --one jacobi --res 128 --steps 3
leg 2700 scripts/bench_mg_ab.py --one mg_asm --res 64 --steps 5 --refresh step
leg 2700 scripts/bench_mg_ab.py --one mg_asm1 --res 64 --steps 5 --refresh step
leg 2700 scripts/bench_mg_build.py
echo "[queue $(date +%H:%M:%S)] ALL DONE" >> "$err"
