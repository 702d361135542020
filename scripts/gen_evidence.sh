#!/bin/bash
# Round-4 generalization evidence pipeline (benchmarks/gen_r4/).
#
# Builds the 32-speaker synthetic corpus, calibrates the codec on it,
# trains the production D3PM + NAR with the trainer's real 95/5 split,
# and collects held-out objective metrics + the speaker-prompt transfer
# measurement into an evidence directory:
#
#   benchmarks/gen_r4/
#     corpus.json            speaker acoustics + corpus stats
#     diffusion_train.jsonl  training stats (loss curve)
#     metrics_val_*.json     held-out token accuracy / MCD per eval tick
#     transfer_eval.json     speaker-prompt transfer accuracy
#
# Stages are idempotent (existing artifacts are reused) so the pipeline
# can resume after an interruption.  Chip time: ~1-2 h end to end.
#
# Usage: bash scripts/gen_evidence.sh [workdir] [evidence_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/gen4}
EVID=${2:-benchmarks/gen_r4}
PKG=tts_with_diffusion_model_tpu

mkdir -p "$EVID"

# ---- 1. corpus ------------------------------------------------------------
if [ ! -f "$WORK/data/train/spk31/utt023.wav" ]; then
  python scripts/make_gen_corpus.py "$WORK/data/train"
fi
if [ ! -f "$WORK/data/train/spk31/utt023.phn.txt" ]; then
  JAX_PLATFORMS=cpu python -m $PKG.emb.g2p "$WORK/data/train"
fi

# ---- 2. codec calibration (k-means++ RVQ bootstrap) -----------------------
if [ ! -f "$WORK/encodec_gen4.npz" ]; then
  python -m $PKG.codec.calibrate "$WORK/data/train" \
      --out "$WORK/encodec_gen4.npz"
fi
export ENCODEC_WEIGHTS="$WORK/encodec_gen4.npz"

# ---- 3. encode ------------------------------------------------------------
if [ ! -f "$WORK/data/train/spk31/utt023.qnt.npy" ]; then
  python -m $PKG.emb.qnt "$WORK/data/train"
fi

# ---- 4. train (configs point log/ckpt roots into $WORK) -------------------
for m in diffusion nar; do
  if [ ! -d "$WORK/zoo/$m" ]; then
    python -m $PKG.train "yaml=config/gen4/$m.yml" < /dev/null
    python -m $PKG.export "$WORK/zoo/$m" "yaml=config/gen4/$m.yml" --ema
  fi
done

# ---- 5. evidence ----------------------------------------------------------
# training curves + the per-tick val metrics the trainer wrote
for m in diffusion nar; do
  run_dir=$(ls -td "$WORK"/logs/gen4/$m/* | head -1)
  grep -h '"model.loss"' "$run_dir/log.txt" > "$EVID/${m}_train.jsonl" || true
  for mj in $(find "$WORK"/logs/gen4/$m -name metrics.json | sort); do
    step=$(python -c "import json,sys;print(json.load(open('$mj'))['mean']['global_step'])")
    name=$(python -c "import json,sys;print(json.load(open('$mj'))['mean']['name'])")
    cp "$mj" "$EVID/metrics_${m}_${name}_step${step}.json"
  done
done

# speaker-prompt transfer (the zero-shot thesis measurement)
python scripts/speaker_transfer_eval.py "$WORK/zoo/diffusion" \
    --out "$EVID/transfer_eval.json" --trials 32 "yaml=config/gen4/diffusion.yml"

echo "evidence collected in $EVID"
