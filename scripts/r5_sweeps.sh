#!/bin/bash
# Round-5 training-throughput sweeps, prioritized for a shared session:
# points run in evidence-value order (the finalize-checked diffusion flash
# row first, then one flash point per family, then dense counterparts), so
# whatever completes before the session ends is already committed-worthy.
# Output filenames match scripts/r4_sweeps.sh so r4_finalize.sh and the
# PARITY rows read the same paths.  Publishes per-point via tmp+mv (a
# failed point leaves no half-written jsonl).  Stages pace the tunnel
# (TUNNEL_PACE, see make_aux_bundles.sh).
#
# Usage: bash scripts/r5_sweeps.sh [outdir]
# Env:   SWEEP_RUNS (timed steps per point, default 4)
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-benchmarks/gen_r4/sweeps}
RUNS=${SWEEP_RUNS:-4}
mkdir -p "$OUT"

run() { # name, args...
  local name=$1; shift
  [ -s "$OUT/$name.jsonl" ] && { echo "skip $name (exists)"; return; }
  sleep "${TUNNEL_PACE:-30}"
  echo "=== [$(date -u +%H:%M:%S)] $name ==="
  if python benchmarks/train_sweep.py --runs "$RUNS" "$@" \
       | tee "$OUT/.$name.tmp" && [ -s "$OUT/.$name.tmp" ]; then
    mv "$OUT/.$name.tmp" "$OUT/$name.jsonl"
  else
    echo "sweep $name FAILED (partial output kept at $OUT/.$name.tmp)"
  fi
}

# D3PM (production d512/8/8, buckets 448/398/50): r3 headline 209.9 utts/s
# (MFU ~19%) at B=192 remat — the known optimum, flash vs dense.
run diffusion_flash --model diffusion --remat --attn-impl flash --batches 192
# AR / NAR at production d1024/16/12 (the reference's 500 h headline,
# README.md:27-30) — the families r3 never charted.
run ar_flash  --model ar  --remat --attn-impl flash --batches 64
run nar_flash --model nar --remat --attn-impl flash --batches 64
run diffusion_dense --model diffusion --remat --batches 192
run ar_dense  --model ar  --remat --batches 32
run nar_dense --model nar --remat --batches 32
# remat-policy refinement + profile of the D3PM flash point.
run diffusion_flash_dots --model diffusion --remat --remat-policy dots \
    --attn-impl flash --batches 192
run diffusion_flash_profiled --model diffusion --remat --attn-impl flash \
    --batches 192 --profile "$OUT/profile"

echo "sweeps done -> $OUT"
