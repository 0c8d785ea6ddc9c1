#!/bin/bash
# Resilient A/B queue: waits for the TPU tunnel to be healthy before
# each entry, retries once on non-OOM failure. Each non-comment line of
# $2 is a full shell command. Results append to $1.
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

grep -v '^\s*#' "$QUEUE" | grep -v '^\s*$' | while read -r cmd; do
  for attempt in 1 2; do
    wait_healthy
    echo "=== $cmd (attempt $attempt) $(date +%H:%M:%S) ===" >> "$LOG"
    timeout 5400 bash -c "$cmd" >> "$LOG" 2>&1
    rc=$?
    echo "--- exit $rc ---" >> "$LOG"
    [ $rc -eq 0 ] && break
    # OOMs are deterministic: don't retry those
    tail -60 "$LOG" | grep -qE "Ran out of memory|RESOURCE_EXHAUSTED" && break
  done
done
echo "QUEUE DONE $(date +%H:%M:%S)" >> "$LOG"
