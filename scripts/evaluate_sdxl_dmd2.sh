#!/usr/bin/env bash
# PickaPic-protocol evaluation of SDXL-DMD2 (+PSO LoRA): 4-step lattice
# [999,749,499,249], guidance 0, PickScore/CLIP/ImageReward/Aesthetic.
set -euo pipefail

MODEL_DIR="${MODEL_DIR:-}"
LORA="${LORA:-}"

python -m pairwise_sample_optimization_tpu.cli.evaluate_sdxl_dmd2 \
  --model_dir="${MODEL_DIR}" \
  --lora_path="${LORA}" \
  --resolution=1024 \
  --num_steps=4 \
  --batch_size=2 \
  --scorers=pickscore,clip,aesthetic,imagereward \
  "$@"
