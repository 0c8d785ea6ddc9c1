#!/bin/bash
# Resilient A/B queue: waits for the TPU tunnel to be healthy before
# each config, retries a config once on non-OOM failure. Configs are
# read from $2 (one env-assignment line per config; '#' comments ok).
# Results append to $1.
set -u
LOG="${1:-/tmp/ab_queue.log}"
QUEUE="${2:?queue file}"
cd "$(dirname "$0")/.."

wait_healthy() {
  until timeout 240 python scripts/tpu_healthy.py >> "$LOG" 2>&1; do
    echo "tunnel down, waiting... $(date +%H:%M:%S)" >> "$LOG"
    sleep 180
  done
}

grep -v '^\s*#' "$QUEUE" | grep -v '^\s*$' | while read -r cfg; do
  for attempt in 1 2; do
    wait_healthy
    echo "=== $cfg (attempt $attempt) $(date +%H:%M:%S) ===" >> "$LOG"
    env $cfg timeout 5400 python -u scripts/bench_full_loop.py >> "$LOG" 2>&1
    rc=$?
    echo "--- exit $rc ---" >> "$LOG"
    [ $rc -eq 0 ] && break
    # OOMs are deterministic: don't retry those
    grep -qE "Ran out of memory|RESOURCE_EXHAUSTED" "$LOG" && \
      tail -50 "$LOG" | grep -qE "Ran out of memory|RESOURCE_EXHAUSTED" && break
  done
done
echo "QUEUE DONE $(date +%H:%M:%S)" >> "$LOG"
