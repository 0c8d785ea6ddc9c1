#!/bin/bash
# Sequential remat-mode A/B on the real chip (idle host required: the
# 1-core host depresses numbers ~20% under concurrent CPU load).
# Each mode is a fresh program hash -> fresh remote compile (5-20 min);
# results append to $1 (default /tmp/ab_remat.log).
set -u
LOG="${1:-/tmp/ab_remat.log}"
cd "$(dirname "$0")/.."
for mode in dots lowres lowres_dots none; do
  echo "=== PSO_REMAT=$mode $(date +%H:%M:%S) ===" >> "$LOG"
  PSO_REMAT=$mode timeout 3600 python -u scripts/bench_full_loop.py >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
done
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
