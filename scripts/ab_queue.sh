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
    ATT_LOG=$(mktemp /tmp/ab_attempt.XXXXXX)
    # </dev/null: a queued command must not drain the queue's stdin
    timeout 5400 bash -c "$cmd" < /dev/null > "$ATT_LOG" 2>&1
    rc=$?
    cat "$ATT_LOG" >> "$LOG"
    echo "--- exit $rc ---" >> "$LOG"
    if [ $rc -eq 0 ]; then rm -f "$ATT_LOG"; break; fi
    # OOMs are deterministic: don't retry those (scoped to THIS attempt)
    if grep -qE "Ran out of memory|RESOURCE_EXHAUSTED" "$ATT_LOG"; then
      rm -f "$ATT_LOG"; break
    fi
    rm -f "$ATT_LOG"
  done
done
echo "QUEUE DONE $(date +%H:%M:%S)" >> "$LOG"
