#!/usr/bin/env bash
# On-chip smoke of the SHIPPED DreamBooth-PSO CLI at full SDXL size:
# synthesize a tiny instance set, run 4 optimizer steps of the
# reference personalization recipe (pso_db loss, EDM space, 2
# self-generated negatives) through cli.train_pso_sdxl_turbo_dreambooth,
# and require the exported LoRA artifact. Random zero-fill weights;
# bf16 storage fits the 16 GB chip.
set -euo pipefail
cd "$(dirname "$0")/.."
DATA=/tmp/pso_db_smoke_data
OUT=/tmp/pso_cli_smoke_db
rm -rf "$DATA" "$OUT"
mkdir -p "$DATA"

python - "$DATA" <<'EOF'
import sys
import numpy as np
from PIL import Image

rng = np.random.default_rng(0)
for i in range(3):
    arr = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
    Image.fromarray(arr).save(f"{sys.argv[1]}/img{i}.png")
print("instance images ready")
EOF

python -u -m pairwise_sample_optimization_tpu.cli.train_pso_sdxl_turbo_dreambooth \
  --fast_init \
  --instance_data_dir="$DATA" \
  --instance_prompt="a photo of sks dog" \
  --class_name="dog" \
  --output_dir="$OUT" \
  --max_train_steps=4 \
  --num_negatives=2 \
  --gradient_checkpointing \
  --skip_validation \
  --checkpointing_steps=0

python - "$OUT" <<'EOF'
import glob, os, sys

hits = glob.glob(os.path.join(sys.argv[1], "lora-*",
                              "pytorch_lora_weights.safetensors"))
assert hits, f"missing exported LoRA under {sys.argv[1]}/lora-*/"
print(f"DB CLI SMOKE OK: exported {hits[0]} ({os.path.getsize(hits[0])} bytes)")
EOF
