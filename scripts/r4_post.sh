#!/bin/bash
# Post-pipeline round-4 chores, chained on the freed chip:
#
#   1. AR→NAR full-stack held-out eval — the reference's primary two-stage
#      pipeline (vall_e/__main__.py:66-73) measured on val-split utterances
#      with the trained gen4b AR + NAR bundles (scripts/heldout_eval.py
#      auto-detects the AR first stage).
#   2. e2e staged/fused latency on the trained bundles
#      (benchmarks/full_pipeline.py).
#   3. scripts/r4_sweeps.sh — dense-vs-flash training-throughput sweeps for
#      all three model families + a profile of the winning D3PM point.
#
# Stages are idempotent (skip when their output exists); run after
# scripts/gen_evidence_v2_all.sh reports DONE.
#
# Usage: bash scripts/r4_post.sh [workdir] [evidence_dir]
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/gen4b}
EVID=${2:-benchmarks/gen_r4}
export ENCODEC_WEIGHTS=${CODEC:-/tmp/gen4/encodec_gen4.npz}

stage() { echo "=== [$(date -u +%H:%M:%S)] $* ==="; }

stage "1/3 AR->NAR full-stack held-out eval"
if [ -d "$WORK/zoo/ar" ] && [ ! -f "$EVID/heldout_fullstack_ar_v2.json" ]; then
  python scripts/heldout_eval.py "$WORK/zoo/ar" --nar-bundle "$WORK/zoo/nar" \
    --out "$EVID/heldout_fullstack_ar_v2.json" --n 16 --resp-bucket 192 \
    "yaml=config/gen4b/ar.yml" || echo "AR full-stack eval FAILED"
fi

stage "2/3 e2e timing on trained bundles (full_pipeline.py)"
if [ ! -f "$EVID/full_pipeline_trained_v2.jsonl" ]; then
  # zoo/{diffusion,nar} = the full-stack winner the post_v2 stage installed
  # for serving (step-12000 tick); the AR bundle lives in the workdir zoo.
  # Write to a temp path and publish only on success, so a failed run
  # doesn't satisfy the idempotence gate with partial evidence.
  if python benchmarks/full_pipeline.py --bf16 --runs 7 \
      --bundle zoo/diffusion --nar-bundle zoo/nar \
      --ar-bundle "$WORK/zoo/ar" \
      | tee "$EVID/.full_pipeline_trained_v2.tmp"; then
    mv "$EVID/.full_pipeline_trained_v2.tmp" \
       "$EVID/full_pipeline_trained_v2.jsonl"
  else
    echo "full_pipeline FAILED (partial output kept at .tmp)"
  fi
fi

stage "3/3 training sweeps (r4_sweeps.sh)"
if [ ! -f "$EVID/sweeps/diffusion_flash.jsonl" ]; then
  bash scripts/r4_sweeps.sh "$EVID/sweeps"
fi

stage "DONE"
