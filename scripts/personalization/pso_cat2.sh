#!/usr/bin/env bash
# DreamBooth PSO for the 'cat2' DreamBooth subject — hyperparameter
# parity with reference personalization/scripts/pso_cat2.sh
# (512^2, bs1, ga4, lr 2e-4 constant, 1600 steps, r=16, pso_db beta=5,
# 20 negatives, prior weight 0.5, EDM-style Euler; gamma_pso and
# neg_generate_freq are reference-inert parity knobs).
set -euo pipefail

DATASET_ROOT="${DATASET_ROOT:?path to the dreambooth dataset root}"
MODEL_DIR="${MODEL_DIR:-}"
OUTPUT_DIR="${OUTPUT_DIR:-./output/cat2}"

python -m pairwise_sample_optimization_tpu.cli.train_pso_sdxl_turbo_dreambooth \
  --pretrained_model_dir="${MODEL_DIR}" \
  --instance_data_dir="${DATASET_ROOT}/cat2" \
  --output_dir="${OUTPUT_DIR}" \
  --instance_prompt="a prt cat" \
  --class_prompt="a cat" \
  --class_name="cat" \
  --unique_token="prt" \
  --resolution=512 \
  --train_batch_size=1 \
  --gradient_accumulation_steps=4 \
  --learning_rate=2e-4 \
  --lr_scheduler=constant \
  --lr_warmup_steps=0 \
  --max_train_steps=1600 \
  --validation_steps=200 \
  --seed=0 \
  --scheduler_space=euler_edm \
  --rank=16 \
  --loss_type=pso_db \
  --beta_pso=5 \
  --gamma_pso=0.0 \
  --num_negatives=20 \
  --prior_loss_weight=0.5 \
  --distill_train_timesteps=4 \
  --neg_generate_freq=1000 \
  "$@"
