#!/usr/bin/env bash
# Online PSO on SDXL-DMD2 (launch parity with the reference
# online_pso_sdxl_dmd2.sh: 1024^2, 8 sampling / 7 train steps, LoRA r=16).
set -euo pipefail

MODEL_DIR="${MODEL_DIR:-}"
BPE_PATH="${BPE_PATH:-${PSO_BPE_PATH:-}}"

python -m pairwise_sample_optimization_tpu.cli.train_online_pso_sdxl_dmd2 \
  --config=pairwise_sample_optimization_tpu/configs/sdxl_dmd_dpo.py \
  --config.pretrained.model_dir="${MODEL_DIR}" \
  --config.pretrained.bpe_path="${BPE_PATH}" \
  --config.sample.num_steps=8 \
  --config.train.distilled_train_steps=7 \
  --config.sample.batch_size=2 \
  --config.train.batch_size=2 \
  --config.train.gradient_accumulation_steps=2 \
  --config.train.lora_rank=16 \
  "$@"
