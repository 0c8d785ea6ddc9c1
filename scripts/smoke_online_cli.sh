#!/usr/bin/env bash
# On-chip smoke of the SHIPPED online-PSO CLI at full SDXL size:
# 2 epochs of the reference workload shape through
# cli.train_online_pso_sdxl_turbo (mesh placement, tokenizers, stat
# tracker, sampling, rewards, shuffled DPO updates), then assert the
# on-policy anchor (first update loss == log 2) from its metrics.jsonl.
# Random zero-fill weights (no checkpoints in this environment);
# bf16 storage so the full-size suite fits the 16 GB chip.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/pso_cli_smoke_online
rm -rf "$OUT"

python -u -m pairwise_sample_optimization_tpu.cli.train_online_pso_sdxl_turbo \
  --config=pairwise_sample_optimization_tpu/configs/sdxl_turbo_dpo.py \
  --config.param_dtype=bfloat16 \
  --config.fast_init=True \
  --config.num_epochs=2 \
  --config.checkpointing_steps=0 \
  --config.validation_steps=0 \
  --config.output_dir="$OUT" \
  --config.run_name=smoke

python - "$OUT/smoke/metrics.jsonl" <<'EOF'
import json, math, sys

rows = [json.loads(l) for l in open(sys.argv[1])]
rows = [r for r in rows if "loss" in r]  # skip epoch-level reward rows
assert rows, "no update metrics logged"
first = rows[0]
assert abs(first["loss"] - math.log(2.0)) < 1e-3, first
assert all(math.isfinite(r["loss"]) for r in rows), "non-finite loss"
print(f"CLI SMOKE OK: {len(rows)} update steps, "
      f"first loss {first['loss']:.6f} (log 2 anchor), "
      f"last loss {rows[-1]['loss']:.6f}")
EOF
