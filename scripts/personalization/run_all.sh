#!/usr/bin/env bash
# Sequential batch runner over all DreamBooth subjects (the reference's
# run_all.sh distributes scripts over GPU ids; one TPU chip here runs
# them back to back — edit SCRIPTS to select a subset).
set -euo pipefail
cd "$(dirname "$0")"
SCRIPTS=(pso_*.sh)
for s in "${SCRIPTS[@]}"; do
  [ "$s" = "run_all.sh" ] && continue
  echo "=== $s ==="
  bash "$s" "$@"
done
