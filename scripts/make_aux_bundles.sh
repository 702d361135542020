#!/bin/bash
# Round-4 aux trained artifacts, session-scale (see scripts/r4_resume2.sh
# for the full-scale recipe; a VM reboot wiped /tmp and the gen4b d1024
# trainings are multi-hour runs).  This rebuilds the same ARTIFACT TYPES on
# a 256-utterance mini corpus from the same generator (32 speakers x 8
# utts, real 95/5 seed-0 split):
#
#   zoo/nar                           trained production-size NAR bundle
#   zoo/encodec_24khz.npz             corpus-calibrated codec for serving
#   benchmarks/gen_r4/spec_decode_mini_v2.json   trained target+draft
#                                     speculative-decoding measurement
#   benchmarks/gen_r4/full_pipeline_trained_v2.jsonl  e2e timing, trained
#
# Corpus scale is disclosed in the configs (config/gen4c/*.yml) and in
# PARITY.md.  Idempotent per stage; later stages skip missing inputs.
#
# Usage: bash scripts/make_aux_bundles.sh
set -uo pipefail
cd "$(dirname "$0")/.."
PKG=tts_with_diffusion_model_tpu
WORK=/tmp/gen4c
EVID=benchmarks/gen_r4

stage() { echo "=== [$(date -u +%H:%M:%S)] $* ==="; }

stage "corpus + g2p (CPU)"
[ -f $WORK/data/train/spk31/utt007.wav ] \
  || python scripts/make_gen_corpus.py $WORK/data/train --utts 8
[ -f $WORK/data/train/spk31/utt007.phn.txt ] \
  || JAX_PLATFORMS=cpu python -m $PKG.emb.g2p $WORK/data/train

stage "codec calibration"
[ -f $WORK/encodec.npz ] \
  || python -m $PKG.codec.calibrate $WORK/data/train --out $WORK/encodec.npz
export ENCODEC_WEIGHTS=$WORK/encodec.npz

stage "qnt encode"
[ -f $WORK/data/train/spk31/utt007.qnt.npy ] \
  || python -m $PKG.emb.qnt $WORK/data/train

# Draft first (cheapest), then the NAR (unblocks zoo + timing), then the
# AR target (largest) — if the session ends mid-chain the most artifacts
# survive.  Trainer auto-resumes from the latest checkpoint on rerun.
for m in ar_quarter nar ar; do
  stage "train $m"
  if [ ! -d "$WORK/zoo/$m" ]; then
    if python -m $PKG.train "yaml=config/gen4c/$m.yml" < /dev/null; then
      python -m $PKG.export "$WORK/zoo/$m" "yaml=config/gen4c/$m.yml" --ema \
        || echo "export $m FAILED"
    else
      echo "train $m FAILED (rerun to resume)"
    fi
  fi
done

stage "install zoo/nar + codec"
if [ ! -d zoo/nar ] && [ -d $WORK/zoo/nar ]; then cp -r $WORK/zoo/nar zoo/nar; fi
[ -f zoo/encodec_24khz.npz ] || cp $WORK/encodec.npz zoo/encodec_24khz.npz

stage "speculative decoding measurement (VERDICT r3 item 7)"
if [ ! -f $EVID/spec_decode_mini_v2.json ] \
   && [ -d $WORK/zoo/ar ] && [ -d $WORK/zoo/ar_quarter ]; then
  python benchmarks/spec_decode_bench.py $WORK/zoo/ar $WORK/zoo/ar_quarter \
    $WORK/data/train --out $EVID/spec_decode_mini_v2.json \
    || echo "spec bench FAILED"
fi

stage "AR->NAR full-stack held-out eval (mini corpus)"
if [ ! -f $EVID/heldout_fullstack_ar_mini_v2.json ] \
   && [ -d $WORK/zoo/ar ] && [ -d $WORK/zoo/nar ]; then
  python scripts/heldout_eval.py $WORK/zoo/ar --nar-bundle $WORK/zoo/nar \
    --out $EVID/heldout_fullstack_ar_mini_v2.json --n 8 --resp-bucket 192 \
    "yaml=config/gen4c/ar.yml" || echo "AR full-stack eval FAILED"
fi

stage "e2e timing on trained bundles (full_pipeline.py)"
if [ ! -f $EVID/full_pipeline_trained_v2.jsonl ] \
   && [ -d zoo/diffusion ] && [ -d zoo/nar ] && [ -d $WORK/zoo/ar ]; then
  if python benchmarks/full_pipeline.py --bf16 --runs 7 \
      --bundle zoo/diffusion --nar-bundle zoo/nar --ar-bundle $WORK/zoo/ar \
      | tee "$EVID/.full_pipeline_trained_v2.tmp"; then
    mv "$EVID/.full_pipeline_trained_v2.tmp" \
       "$EVID/full_pipeline_trained_v2.jsonl"
  else
    echo "full_pipeline FAILED (partial output kept at .tmp)"
  fi
fi

stage "ALL DONE"
