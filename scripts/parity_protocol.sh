#!/usr/bin/env bash
# One-command real-weight parity runbook.
#
# Runs the reference's evaluation protocol (SDXL-DMD2 4-step lattice
# [999,749,499,249], guidance 0, seed-0 per-prompt generators, PickaPic
# test_unique) with ALL scorers from local weight files and writes
# PARITY_RESULTS.md with the four means — the numbers BASELINE.md defines
# parity against (reference evaluate_sdxl_dmd2.py:50-131,228-236).
#
# This environment has zero network egress and ships no real weights, so
# the command cannot run here; when a weights_root exists, this is the
# single command that produces the parity table.
#
# Usage:
#   scripts/parity_protocol.sh <weights_root> [max_prompts]
#
# Expected layout under <weights_root> (every entry is a local file/dir):
#   sdxl/                 diffusers-layout SDXL-base dir whose UNet weights
#                         are DMD2's (tianweiy/DMD2 dmd2_sdxl_4step_unet_fp16)
#   lora/pytorch_lora_weights.safetensors
#                         released ZichenMiao/PSO SDXL_DMD2 LoRA (optional:
#                         omit the file to evaluate the base DMD2 model)
#   pickscore/            HF CLIPModel dir  (yuvalkirstain/PickScore_v1)
#   clip/                 HF CLIPModel dir  (laion/CLIP-ViT-H-14-laion2B-s32B-b79K)
#   aesthetic_clip/       HF CLIPModel dir  (openai/clip-vit-large-patch14)
#   imagereward/ImageReward-v1.0.pt
#   imagereward/vocab.txt bert-base wordpiece vocab (BLIP med tokenizer)
#   hps/HPS_v2_compressed.pt   (optional; adds the HPS column — the
#                         reference's own HPS scorer is unimportable)
#   prompts.json          PickaPic test_unique captions export (a JSON list
#                         or {"test_unique": [...]} dict); alternatively
#                         pass PSO_HF_DATASET=<save_to_disk dir>
#   bpe/bpe_simple_vocab_16e6.txt.gz   CLIP BPE vocab (or set PSO_BPE_PATH)
set -euo pipefail

ROOT=${1:?usage: parity_protocol.sh <weights_root> [max_prompts]}
MAX=${2:-0}
OUT_JSON=${PSO_PARITY_JSON:-parity_results.json}
OUT_MD=${PSO_PARITY_MD:-PARITY_RESULTS.md}

SCORERS="pickscore,clip,aesthetic,imagereward"
HPS_ARGS=()
if [ -f "$ROOT/hps/HPS_v2_compressed.pt" ]; then
  SCORERS="$SCORERS,hps"
  HPS_ARGS=(--hps_path "$ROOT/hps/HPS_v2_compressed.pt")
fi
LORA_ARGS=()
if [ -f "$ROOT/lora/pytorch_lora_weights.safetensors" ]; then
  LORA_ARGS=(--lora_path "$ROOT/lora/pytorch_lora_weights.safetensors")
fi
PROMPT_ARGS=(--prompts_json "$ROOT/prompts.json")
if [ -n "${PSO_HF_DATASET:-}" ]; then
  PROMPT_ARGS=(--hf_dataset "$PSO_HF_DATASET" --split test_unique)
fi
BPE=${PSO_BPE_PATH:-$ROOT/bpe/bpe_simple_vocab_16e6.txt.gz}

python -m pairwise_sample_optimization_tpu.cli.evaluate_sdxl_dmd2 \
  --model_dir "$ROOT/sdxl" \
  ${LORA_ARGS[@]+"${LORA_ARGS[@]}"} \
  ${HPS_ARGS[@]+"${HPS_ARGS[@]}"} \
  --bpe_path "$BPE" \
  ${PROMPT_ARGS[@]+"${PROMPT_ARGS[@]}"} \
  --max_prompts "$MAX" \
  --resolution 1024 --num_steps 4 --batch_size 2 --seed 0 \
  --scorers "$SCORERS" \
  --pickscore_dir "$ROOT/pickscore" \
  --clip_dir "$ROOT/clip" \
  --clip_resize_max_size \
  --aesthetic_mlp_path packaged \
  --aesthetic_clip_dir "$ROOT/aesthetic_clip" \
  --imagereward_path "$ROOT/imagereward/ImageReward-v1.0.pt" \
  --wordpiece_vocab "$ROOT/imagereward/vocab.txt" \
  --gelu_exact \
  --output_json "$OUT_JSON" \
  "${@:3}"

python - "$OUT_JSON" "$OUT_MD" <<'PYEOF'
import json, sys
res = json.load(open(sys.argv[1]))
rows = [k for k in res if k.endswith("_mean")]
with open(sys.argv[2], "w") as f:
    f.write("# Real-weight parity results (reference protocol)\n\n")
    f.write(f"SDXL-DMD2 4-step, guidance 0, seed 0, {res['n_prompts']} prompts "
            "(PickaPic test_unique), open_clip ResizeMaxSize CLIP transform, "
            "exact-erf GELU.\n\n")
    f.write("| metric | mean |\n|---|---|\n")
    for k in rows:
        f.write(f"| {k[:-5]} | {res[k]:.8f} |\n")
    f.write("\nCompare each row against the reference run of "
            "`evaluate_sdxl_dmd2.py` on the same prompt set "
            "(BASELINE.md: parity = matching means).\n")
print(f"wrote {sys.argv[2]}")
PYEOF
