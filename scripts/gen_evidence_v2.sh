#!/bin/bash
# Round-4 generalization evidence, v2: the production D3PM on the 4x corpus
# (32 speakers x 96 utterances — config/gen4b/diffusion.yml rationale).
#
# The v1 run (scripts/gen_evidence.sh) proves prompt-steered speaker
# transfer but memorizes its 730-utterance corpus (val loss rises from the
# first tick).  This run scales data 4x so the val loss has a real
# decreasing regime, checkpoints every eval tick, picks the val-loss
# minimum post hoc, and exports THAT model (restore_step) for the held-out
# and transfer measurements.
#
#   benchmarks/gen_r4/
#     diffusion_v2_train.jsonl     loss curve (train)
#     diffusion_v2_val.jsonl       per-tick val losses
#     metrics_diffusion_v2_*.json  held-out token accuracy / MCD per tick
#     best_tick_v2.json            chosen step + its val loss
#     transfer_eval_v2.json        speaker-prompt transfer on the best tick
#
# Usage: bash scripts/gen_evidence_v2.sh [workdir] [evidence_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/gen4b}
EVID=${2:-benchmarks/gen_r4}
CODEC=${CODEC:-/tmp/gen4/encodec_gen4.npz}
PKG=tts_with_diffusion_model_tpu

mkdir -p "$EVID"

# ---- 1. corpus ------------------------------------------------------------
if [ ! -f "$WORK/data/train/spk31/utt095.wav" ]; then
  python scripts/make_gen_corpus.py "$WORK/data/train" --utts 96
fi
if [ ! -f "$WORK/data/train/spk31/utt095.phn.txt" ]; then
  JAX_PLATFORMS=cpu python -m $PKG.emb.g2p "$WORK/data/train"
fi

# ---- 2. codec (reuse the v1 calibration — same synthesis family) ----------
test -f "$CODEC" || { echo "no calibrated codec at $CODEC"; exit 1; }
export ENCODEC_WEIGHTS="$CODEC"

# ---- 3. encode ------------------------------------------------------------
if [ ! -f "$WORK/data/train/spk31/utt095.qnt.npy" ]; then
  python -m $PKG.emb.qnt "$WORK/data/train"
fi

# ---- 4. train -------------------------------------------------------------
if [ ! -d "$WORK/zoo/diffusion_last" ]; then
  python -m $PKG.train "yaml=config/gen4b/diffusion.yml" < /dev/null
  python -m $PKG.export "$WORK/zoo/diffusion_last" \
      "yaml=config/gen4b/diffusion.yml" --ema
fi

# ---- 5. pick the val-loss minimum tick, export that model -----------------
run_dir=$(ls -td "$WORK"/logs/gen4b/diffusion/* | head -1)
grep -h '"model.loss"' "$run_dir/log.txt" > "$EVID/diffusion_v2_train.jsonl" || true
grep -h "'name': 'val'" "$run_dir/log.txt" > "$EVID/diffusion_v2_val.jsonl" || true
BEST=$(python - "$run_dir/log.txt" <<'EOF'
import re, sys
best = None
for line in open(sys.argv[1]):
    m = re.search(r"'loss': ([0-9.eE+-]+), 'global_step': (\d+), 'name': 'val'", line)
    if m and (best is None or float(m.group(1)) < best[0]):
        best = (float(m.group(1)), int(m.group(2)))
assert best, "no val Eval lines in the log"
print(f"{best[1]} {best[0]}")
EOF
)
read -r BEST_STEP BEST_LOSS <<< "$BEST"
echo "{\"best_step\": $BEST_STEP, \"best_val_loss\": $BEST_LOSS}" \
    > "$EVID/best_tick_v2.json"
if [ ! -d "$WORK/zoo/diffusion" ]; then
  python -m $PKG.export "$WORK/zoo/diffusion" \
      "yaml=config/gen4b/diffusion.yml" "restore_step=$BEST_STEP" --ema
fi

for mj in $(find "$WORK"/logs/gen4b/diffusion -name metrics.json | sort); do
  step=$(python -c "import json;print(json.load(open('$mj'))['mean']['global_step'])")
  name=$(python -c "import json;print(json.load(open('$mj'))['mean']['name'])")
  cp "$mj" "$EVID/metrics_diffusion_v2_${name}_step${step}.json"
done

# ---- 6. speaker-prompt transfer on the best-tick model --------------------
python scripts/speaker_transfer_eval.py "$WORK/zoo/diffusion" \
    --out "$EVID/transfer_eval_v2.json" --trials 32 \
    "yaml=config/gen4b/diffusion.yml"

echo "v2 evidence collected in $EVID"
