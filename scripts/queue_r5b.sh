#!/usr/bin/env bash
# Round-5 prioritized on-chip measurement queue (second attempt: the
# original queue_r5.sh never got chip time before the previous session
# ended). Ordered by VERDICT-r4 value so an early wall-clock cutoff
# still leaves the most important artifacts:
#   1. DreamBooth-PSO full-size throughput (VERDICT r4 #3) — the only
#      reference trainer with zero measured operating point
#   2. eval-protocol throughput at 32 prompts (VERDICT r4 #4)
#   3. int8 scorer-tower qualification + headline A/B (VERDICT r4 #7)
#   4. final clean warm bench (leaves the cache hot for the driver)
# Serialized: concurrent CPU work on the 1-core host depresses numbers
# ~20% (CLAUDE.md) — run as ONE tracked background task, never nohup.
set -u
mkdir -p /tmp/ab_r5
cd /root/repo

probe() {
  for i in $(seq 1 60); do
    if timeout 180 python scripts/tpu_healthy.py >/dev/null 2>&1; then return 0; fi
    echo "[queue] chip unhealthy, waiting ($i)"; sleep 120
  done
  return 1
}

run() {  # run <logname> <cmd...>
  local log="/tmp/ab_r5/$1.log"; shift
  probe || { echo "[queue] giving up waiting for chip"; exit 1; }
  echo "[queue] $(date +%H:%M:%S) start: $* -> $log"
  # outer watchdog: a post-drain backend init can HANG in-process (no
  # exception, so in-script retries never fire). timeout turns the
  # hang into rc=124; the next probe() serializes behind recovery.
  timeout 4500 "$@" > "$log" 2>&1
  local rc=$?
  echo "[queue] $(date +%H:%M:%S) done rc=$rc : $(tail -c 400 "$log" | tr '\n' ' ')"
}

# ---- 1. DreamBooth throughput (reference pso_dog.sh shape) ----
run db_remat_none python -u scripts/bench_dreambooth.py

# ---- 2. eval protocol at scale (random weights; throughput only) ----
python - <<'PYEOF'
toks = (["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
        + [chr(c) for c in range(ord("a"), ord("z") + 1)]
        + ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)]
        + ["the", "a", "of", "photo", "painting", "##ing", "##ed"])
open("/tmp/ab_r5/vocab.txt", "w").write("\n".join(toks))
PYEOF

run eval32_resident python -u -m pairwise_sample_optimization_tpu.cli.evaluate_sdxl_dmd2 \
  --max_prompts=32 --batch_size=2 --resolution=1024 --num_steps=4 \
  --scorers=pickscore,clip --timing \
  --output_json=/tmp/ab_r5/eval32_resident.json

run eval32_offload5 python -u -m pairwise_sample_optimization_tpu.cli.evaluate_sdxl_dmd2 \
  --max_prompts=32 --batch_size=2 --resolution=1024 --num_steps=4 \
  --scorers=pickscore,clip,hps,aesthetic,imagereward \
  --wordpiece_vocab=/tmp/ab_r5/vocab.txt \
  --offload_scorers --timing \
  --output_json=/tmp/ab_r5/eval32_offload5.json

# ---- 3. int8 scorer tower ----
run qual_int8_scorer_random python -u scripts/qualify_int8_scorer.py 64 random
run qual_int8_scorer_adversarial python -u scripts/qualify_int8_scorer.py 64 het_ln_ortho
run bench_int8_scorer env PSO_INT8_SCORER=1 python -u bench.py

# ---- 4. secondary DreamBooth variants (if time allows) ----
run db_onetime env PSO_DB_ONETIME=1 PSO_DB_STEPS=10 python -u scripts/bench_dreambooth.py
run db_remat_full env PSO_DB_REMAT=full python -u scripts/bench_dreambooth.py

# ---- final: clean warm headline run (default knobs) — leaves the
# persistent cache hot for the driver's end-of-round bench
run bench_warm_final python -u bench.py

echo "[queue] all done $(date +%H:%M:%S)"
