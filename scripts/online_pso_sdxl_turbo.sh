#!/usr/bin/env bash
# Online PSO on SDXL-Turbo (launch parity with the reference
# online_pso_sdxl_turbo.sh: 512^2, 4 sampling / 3 train steps, LoRA r=32,
# beta=50, eps=0.1). One process per TPU host; the mesh handles chips.
#
# Set MODEL_DIR to a local diffusers-layout SDXL-Turbo checkpoint and
# BPE_PATH to a CLIP BPE vocab for a real run; omit for a smoke run.
set -euo pipefail

MODEL_DIR="${MODEL_DIR:-}"
BPE_PATH="${BPE_PATH:-${PSO_BPE_PATH:-}}"
PICKSCORE="${PICKSCORE:-}"

python -m pairwise_sample_optimization_tpu.cli.train_online_pso_sdxl_turbo \
  --config=pairwise_sample_optimization_tpu/configs/sdxl_turbo_dpo.py \
  --config.pretrained.model_dir="${MODEL_DIR}" \
  --config.pretrained.bpe_path="${BPE_PATH}" \
  --config.pretrained.pickscore_dir="${PICKSCORE}" \
  --config.sample.num_steps=4 \
  --config.train.distilled_train_steps=3 \
  --config.sample.batch_size=4 \
  --config.sample.num_batches_per_epoch=4 \
  --config.train.batch_size=4 \
  --config.train.gradient_accumulation_steps=2 \
  --config.train.lora_rank=32 \
  --config.train.learning_rate=1e-5 \
  --config.train.beta=50 \
  --config.train.eps=0.1 \
  "$@"
