#!/bin/bash
# Trimmed round-4 training-throughput sweeps (r3 VERDICT items 6 and 8),
# sized for a shared ~1 h session: one representative point per
# (family, attention) cell instead of the full grid in scripts/r4_sweeps.sh
# (which stays the reference recipe for a free chip).  Output filenames
# match r4_sweeps.sh so scripts/r4_finalize.sh and the PARITY rows read
# the same paths.
#
# Usage: bash scripts/r4_sweeps_fast.sh [outdir]
# Env:   SWEEP_RUNS (timed steps per point, default 6)
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-benchmarks/gen_r4/sweeps}
RUNS=${SWEEP_RUNS:-6}
mkdir -p "$OUT"

run() { # name, args...
  local name=$1; shift
  echo "=== [$(date -u +%H:%M:%S)] $name ==="
  # write to a temp path and publish only on success, so a failed sweep
  # doesn't leave a partial/empty $name.jsonl that satisfies existence
  # checks (round-4 advisor finding)
  if python benchmarks/train_sweep.py --runs "$RUNS" "$@" \
       | tee "$OUT/.$name.tmp" && [ -s "$OUT/.$name.tmp" ]; then
    mv "$OUT/.$name.tmp" "$OUT/$name.jsonl"
  else
    echo "sweep $name FAILED (partial output kept at $OUT/.$name.tmp)"
  fi
}

# D3PM (production d512/8/8, buckets 448/398/50): r3 headline 209.9 utts/s
# (MFU ~19%) at B=192 remat.  Dense vs fused-flash at the known optimum.
run diffusion_dense --model diffusion --remat --batches 192
run diffusion_flash --model diffusion --remat --attn-impl flash \
    --batches 192,256

# AR / NAR at production d1024/16/12 (the reference's 500 h headline,
# README.md:27-30) — the families r3 never charted (VERDICT weak 6).
run ar_dense  --model ar  --remat --batches 32
run ar_flash  --model ar  --remat --attn-impl flash --batches 64
run nar_dense --model nar --remat --batches 32
run nar_flash --model nar --remat --attn-impl flash --batches 64

# remat-policy refinement + profile of the D3PM flash point (VERDICT 8).
run diffusion_flash_dots --model diffusion --remat --remat-policy dots \
    --attn-impl flash --batches 192
run diffusion_flash_profiled --model diffusion --remat --attn-impl flash \
    --batches 192 --profile "$OUT/profile"

echo "sweeps done -> $OUT"
