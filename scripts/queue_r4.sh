#!/usr/bin/env bash
# Round-4 on-chip measurement queue (serialized: concurrent CPU work
# depresses bench numbers ~20% on the 1-core host — CLAUDE.md gotchas).
#
#   1. 512^2 turbo full loop: control vs int8 frozen-reference pass
#   2. 1024^2 DMD2 full loop: control vs int8 frozen-reference pass
#   3. int8-decode qualification over structured weight ensembles
#   4. full-size 5-scorer eval cotenancy smoke (--offload_scorers)
#
# Logs land in /tmp/ab_r4/; summarize into BENCHMARKS.md afterwards.
set -u
mkdir -p /tmp/ab_r4
cd /root/repo

probe() {
  for i in $(seq 1 60); do
    if timeout 120 python scripts/tpu_healthy.py >/dev/null 2>&1; then return 0; fi
    echo "[queue] chip unhealthy, waiting ($i)"; sleep 120
  done
  return 1
}

run() {  # run <logname> <cmd...>
  local log="/tmp/ab_r4/$1.log"; shift
  probe || { echo "[queue] giving up waiting for chip"; exit 1; }
  echo "[queue] $(date +%H:%M:%S) start: $* -> $log"
  "$@" > "$log" 2>&1
  local rc=$?  # capture BEFORE the $(date)/$(tail) substitutions reset $?
  echo "[queue] $(date +%H:%M:%S) done rc=$rc : $(tail -c 400 "$log" | tr '\n' ' ')"
}

run turbo_control        python -u scripts/bench_full_loop.py
run turbo_int8ref        env PSO_INT8_REF=1 python -u scripts/bench_full_loop.py
run dmd_control          env PSO_SAMPLER=dmd python -u scripts/bench_full_loop.py
run dmd_int8ref          env PSO_SAMPLER=dmd PSO_INT8_REF=1 python -u scripts/bench_full_loop.py

for e in het_gn ortho het_gn_ortho; do
  run "qual_$e" python -u scripts/qualify_int8_decode.py 64 "$e"
done

# synthetic wordpiece vocab: the smoke needs a valid vocab FILE, not the
# real bert vocab (weights-adjacent asset; scores are random-weight here)
python - <<'PYEOF'
toks = (["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
        + [chr(c) for c in range(ord("a"), ord("z") + 1)]
        + ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)]
        + ["the", "a", "of", "photo", "painting", "##ing", "##ed"])
open("/tmp/ab_r4/vocab.txt", "w").write("\n".join(toks))
PYEOF
run eval5_smoke python -u -m pairwise_sample_optimization_tpu.cli.evaluate_sdxl_dmd2 \
  --resolution 1024 --num_steps 4 --batch_size 2 --max_prompts 4 \
  --scorers pickscore,clip,aesthetic,imagereward,hps \
  --wordpiece_vocab /tmp/ab_r4/vocab.txt --offload_scorers \
  --output_json /tmp/ab_r4/eval5.json

echo "[queue] all done"
