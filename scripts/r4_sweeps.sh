#!/bin/bash
# Round-4 performance sweeps (run on a FREE chip, after the evidence
# pipeline): training throughput rows for all three families, dense vs
# fused-flash attention, plus a profile of the best D3PM point.
#
#   benchmarks/gen_r4/sweeps/
#     diffusion_dense.jsonl / diffusion_flash.jsonl
#     ar_flash.jsonl / nar_flash.jsonl (+ dense rows for the comparison)
#     profile/  jax.profiler trace of the winning D3PM batch
#
# Usage: bash scripts/r4_sweeps.sh [outdir]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-benchmarks/gen_r4/sweeps}
mkdir -p "$OUT"

run() { # name, args...
  local name=$1; shift
  echo "=== [$(date -u +%H:%M:%S)] $name ==="
  python benchmarks/train_sweep.py "$@" | tee "$OUT/$name.jsonl"
}

# D3PM (production d512/8/8, buckets 448/398/50): the r3 headline was
# 209.9 utts/s (MFU ~19%) at B=192 remat.  Measure dense vs flash.
run diffusion_dense --model diffusion --remat --batches 96,192,256
run diffusion_flash --model diffusion --remat --attn-impl flash \
    --batches 96,192,256,384

# AR / NAR at production d1024/16/12 (the reference's 500 h headline).
# Packed T = 50 + 1 + 398 + 1 + 448 = 898; dense OOMs near B=64 (v1 NAR
# run) — flash lifts both memory and HBM traffic.
run ar_dense  --model ar  --remat --batches 16,32,48
run ar_flash  --model ar  --remat --attn-impl flash --batches 32,64,96,128
run nar_dense --model nar --remat --batches 16,32,48
run nar_flash --model nar --remat --attn-impl flash --batches 32,64,96,128

# remat-policy refinement on the D3PM flash winner
run diffusion_flash_dots --model diffusion --remat --remat-policy dots \
    --attn-impl flash --batches 192,256,384

# profile the flash D3PM at B=192 for the roofline narrative
run diffusion_flash_profiled --model diffusion --remat --attn-impl flash \
    --batches 192 --runs 20 --profile "$OUT/profile"

echo "sweeps done -> $OUT"
