#!/usr/bin/env bash
# DreamBooth PSO for a 'dog' subject (parity with the reference
# personalization/scripts/pso_dog.sh: 512^2, bs1, ga4, lr 2e-4, 1600
# steps, r=16, pso_db beta=5, 20 negatives, prior weight 0.5).
set -euo pipefail

INSTANCE_DIR="${INSTANCE_DIR:?path to subject images}"
MODEL_DIR="${MODEL_DIR:-}"

python -m pairwise_sample_optimization_tpu.cli.train_pso_sdxl_turbo_dreambooth \
  --pretrained_model_dir="${MODEL_DIR}" \
  --instance_data_dir="${INSTANCE_DIR}" \
  --instance_prompt="a photo of sks dog" \
  --class_prompt="a photo of dog" \
  --resolution=512 \
  --train_batch_size=1 \
  --gradient_accumulation_steps=4 \
  --learning_rate=2e-4 \
  --max_train_steps=1600 \
  --rank=16 \
  --loss_type=pso_db \
  --beta_pso=5 \
  --num_negatives=20 \
  --prior_loss_weight=0.5 \
  "$@"
