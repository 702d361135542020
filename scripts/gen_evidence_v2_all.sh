#!/bin/bash
# Round-4 evidence master driver (v2 corpus): chains every chip-bound stage
# sequentially on the single attached chip, each one idempotent so the whole
# pipeline resumes after an interruption:
#
#   1. scripts/gen_evidence_v2.sh   corpus + D3PM + best-val tick + transfer
#   2. NAR train/export             config/gen4b/nar.yml (OOM-fixed buckets)
#   3. scripts/gen_evidence_post_v2.sh  full-stack held-out eval + zoo
#   4. AR + ar-quarter train        config/gen4b/{ar,ar_quarter}.yml
#   5. spec-decode measurement      benchmarks/spec_decode_bench.py
#
# Progress lands in benchmarks/gen_r4/; stage starts/ends in $LOG.
#
# Usage: bash scripts/gen_evidence_v2_all.sh [workdir] [evidence_dir]
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/gen4b}
EVID=${2:-benchmarks/gen_r4}
CODEC=${CODEC:-/tmp/gen4/encodec_gen4.npz}
PKG=tts_with_diffusion_model_tpu

stage() { echo "=== [$(date -u +%H:%M:%S)] $* ==="; }

stage "1/5 D3PM evidence (gen_evidence_v2.sh)"
bash scripts/gen_evidence_v2.sh "$WORK" "$EVID" || exit 1

export ENCODEC_WEIGHTS="$CODEC"

stage "2/5 NAR train"
if [ ! -d "$WORK/zoo/nar" ]; then
  python -m $PKG.train "yaml=config/gen4b/nar.yml" < /dev/null || exit 1
  python -m $PKG.export "$WORK/zoo/nar" "yaml=config/gen4b/nar.yml" --ema || exit 1
  run_dir=$(ls -td "$WORK"/logs/gen4b/nar/* | head -1)
  grep -h '"model.loss"' "$run_dir/log.txt" > "$EVID/nar_v2_train.jsonl" || true
  for mj in $(find "$WORK"/logs/gen4b/nar -name metrics.json | sort); do
    step=$(python -c "import json;print(json.load(open('$mj'))['mean']['global_step'])")
    name=$(python -c "import json;print(json.load(open('$mj'))['mean']['name'])")
    cp "$mj" "$EVID/metrics_nar_v2_${name}_step${step}.json"
  done
fi

stage "3/5 full-stack held-out eval (gen_evidence_post_v2.sh)"
bash scripts/gen_evidence_post_v2.sh "$WORK" "$EVID" || exit 1

stage "4/5 AR + ar-quarter train"
for m in ar ar_quarter; do
  if [ ! -d "$WORK/zoo/$m" ]; then
    python -m $PKG.train "yaml=config/gen4b/$m.yml" < /dev/null || exit 1
    python -m $PKG.export "$WORK/zoo/$m" "yaml=config/gen4b/$m.yml" --ema || exit 1
  fi
done
run_dir=$(ls -td "$WORK"/logs/gen4b/ar/* | head -1)
grep -h '"model.loss"' "$run_dir/log.txt" > "$EVID/ar_v2_train.jsonl" || true
for mj in $(find "$WORK"/logs/gen4b/ar -name metrics.json | sort); do
  step=$(python -c "import json;print(json.load(open('$mj'))['mean']['global_step'])")
  name=$(python -c "import json;print(json.load(open('$mj'))['mean']['name'])")
  cp "$mj" "$EVID/metrics_ar_v2_${name}_step${step}.json"
done

stage "5/5 speculative decoding measurement"
python benchmarks/spec_decode_bench.py "$WORK/zoo/ar" "$WORK/zoo/ar_quarter" \
    "$WORK/data/train" --out "$EVID/spec_decode_v2.json" || exit 1

stage "DONE — evidence in $EVID"
