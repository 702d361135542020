#!/bin/bash
# Round-4 resume after a VM reboot wiped /tmp (trained checkpoints, bundles,
# corpus, calibrated codec — all ephemeral by design; the *evidence* is
# committed).  Rebuild the trained artifacts deterministically, then land the
# still-missing round-4 artifacts:
#
#   - benchmarks/gen_r4/heldout_fullstack_ar_v2.json  (AR→NAR held-out eval)
#   - benchmarks/gen_r4/spec_decode_v2.json           (trained-pair speculative
#                                                      decoding measurement)
#   - benchmarks/gen_r4/full_pipeline_trained_v2.jsonl (e2e timing, trained)
#   - benchmarks/gen_r4/sweeps/                       (dense-vs-flash training
#                                                      sweeps, all families)
#
# plus a trained production D3PM at zoo/diffusion so the driver's bench.py
# reports weights: trained.  Every stage is idempotent; failures don't abort
# later independent stages; rerunning resumes (trainer auto-resumes from the
# latest checkpoint).
#
# Usage: bash scripts/r4_resume2.sh
set -uo pipefail
cd "$(dirname "$0")/.."
PKG=tts_with_diffusion_model_tpu
WORK=/tmp/gen4b
EVID=benchmarks/gen_r4
CODEC=/tmp/gen4/encodec_gen4.npz

stage() { echo "=== [$(date -u +%H:%M:%S)] $* ==="; }

# -- 0. trained production bench bundle at zoo/diffusion (driver bench) -----
stage "0/6 bench bundle (zoo/diffusion)"
if [ ! -d zoo/diffusion ]; then
  bash scripts/make_bench_bundle.sh || echo "bench bundle FAILED"
fi

# -- 1. v1 corpus + codec calibration: deterministic, reproduces the codec
#       the committed v2 evidence was encoded with (scripts/gen_evidence.sh) -
stage "1/6 codec calibration"
if [ ! -f "$CODEC" ]; then
  [ -f /tmp/gen4/data/train/spk31/utt023.wav ] \
    || python scripts/make_gen_corpus.py /tmp/gen4/data/train
  python -m $PKG.codec.calibrate /tmp/gen4/data/train --out "$CODEC" || exit 1
fi
export ENCODEC_WEIGHTS="$CODEC"

# -- 2. v2 corpus + preprocess (deterministic generator + seeded g2p/qnt) ----
stage "2/6 v2 corpus"
[ -f $WORK/data/train/spk31/utt095.wav ] \
  || python scripts/make_gen_corpus.py $WORK/data/train --utts 96
[ -f $WORK/data/train/spk31/utt095.phn.txt ] \
  || JAX_PLATFORMS=cpu python -m $PKG.emb.g2p $WORK/data/train
[ -f $WORK/data/train/spk31/utt095.qnt.npy ] \
  || python -m $PKG.emb.qnt $WORK/data/train

# -- 3. trainings (configs: config/gen4b/*.yml; auto-resume on rerun) --------
for m in ar nar ar_quarter; do
  stage "3/6 train $m"
  if [ ! -d "$WORK/zoo/$m" ]; then
    if python -m $PKG.train "yaml=config/gen4b/$m.yml" < /dev/null; then
      python -m $PKG.export "$WORK/zoo/$m" "yaml=config/gen4b/$m.yml" --ema \
        || echo "export $m FAILED"
    else
      echo "train $m FAILED (rerun to resume)"
    fi
  fi
done

# -- 4. speculative decoding measurement (r3 VERDICT next-round #7) ----------
stage "4/6 speculative decoding measurement"
if [ ! -f "$EVID/spec_decode_v2.json" ] \
   && [ -d "$WORK/zoo/ar" ] && [ -d "$WORK/zoo/ar_quarter" ]; then
  python benchmarks/spec_decode_bench.py "$WORK/zoo/ar" "$WORK/zoo/ar_quarter" \
    "$WORK/data/train" --out "$EVID/spec_decode_v2.json" \
    || echo "spec bench FAILED"
fi

# -- 5. serving zoo pieces the timing rows need ------------------------------
stage "5/6 install zoo/nar + codec"
if [ ! -d zoo/nar ] && [ -d "$WORK/zoo/nar" ]; then cp -r "$WORK/zoo/nar" zoo/nar; fi
[ -f zoo/encodec_24khz.npz ] || cp "$CODEC" zoo/encodec_24khz.npz

# -- 6. the r4_post chain: AR full-stack eval, trained e2e timing, sweeps ----
stage "6/6 r4_post (heldout AR eval, full_pipeline timing, sweeps)"
CODEC="$CODEC" bash scripts/r4_post.sh "$WORK" "$EVID"

stage "ALL DONE"
