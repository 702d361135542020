#!/bin/bash
# Round-4 AR evidence: train the production AR (reference's primary first
# stage) and the ar-quarter speculative draft on the generalization corpus,
# then measure speculative decoding on the trained pair (VERDICT r3 item 7).
#
# Run AFTER scripts/gen_evidence.sh (reuses its corpus/codec in $WORK).
#
#   benchmarks/gen_r4/
#     ar_train.jsonl          AR loss curve
#     metrics_ar_*.json       held-out token accuracy / MCD per eval tick
#     spec_decode.json        acceptance rate + speedup, trained draft+target
#
# Usage: bash scripts/gen_evidence_ar.sh [workdir] [evidence_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/gen4}
EVID=${2:-benchmarks/gen_r4}
PKG=tts_with_diffusion_model_tpu

test -f "$WORK/encodec_gen4.npz" || {
  echo "run scripts/gen_evidence.sh first (no calibrated codec in $WORK)"; exit 1; }
export ENCODEC_WEIGHTS="$WORK/encodec_gen4.npz"
mkdir -p "$EVID"

for m in ar ar_quarter; do
  if [ ! -d "$WORK/zoo/$m" ]; then
    python -m $PKG.train "yaml=config/gen4/$m.yml" < /dev/null
    python -m $PKG.export "$WORK/zoo/$m" "yaml=config/gen4/$m.yml" --ema
  fi
done

run_dir=$(ls -td "$WORK"/logs/gen4/ar/* | head -1)
grep -h '"model.loss"' "$run_dir/log.txt" > "$EVID/ar_train.jsonl" || true
for mj in $(find "$WORK"/logs/gen4/ar -name metrics.json | sort); do
  step=$(python -c "import json;print(json.load(open('$mj'))['mean']['global_step'])")
  name=$(python -c "import json;print(json.load(open('$mj'))['mean']['name'])")
  cp "$mj" "$EVID/metrics_ar_${name}_step${step}.json"
done

python benchmarks/spec_decode_bench.py "$WORK/zoo/ar" "$WORK/zoo/ar_quarter" \
    "$WORK/data/train" --out "$EVID/spec_decode.json"

echo "AR evidence collected in $EVID"
