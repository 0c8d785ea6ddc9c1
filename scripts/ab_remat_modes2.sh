#!/bin/bash
# Sweep 2: DMD2 1024^2 remat modes + decode-chunk retune; turbo dots at
# micro-bs 2. Sequential, idle host required. Results append to $1.
set -u
LOG="${1:-/tmp/ab_remat2.log}"
cd "$(dirname "$0")/.."
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> "$LOG"
  env "$@" timeout 5400 python -u scripts/bench_full_loop.py >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}
run PSO_SAMPLER=dmd PSO_REMAT=dots
run PSO_SAMPLER=dmd PSO_REMAT=lowres_dots
run PSO_SAMPLER=dmd PSO_REMAT=full PSO_DECODE_CHUNK=0
run PSO_REMAT=dots PSO_TRAIN_BS=2 PSO_GA=4
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
