#!/bin/bash
# Produce a TRAINED production-size D3PM bundle at zoo/diffusion so that
# bench.py (and the driver's end-of-round bench run) times trained weights
# instead of random init (round-2 VERDICT weak #5).
#
# Recipe = scripts/soak.sh without the kill/resume choreography: build the
# 2-utterance overfit corpus (the diffusion analogue of the reference's
# one-sample overfit convention, /root/reference/vall_e/vall_e/nar.py:149-165),
# preprocess, train the registry-default D3PM (d_model 512, 8 DiT layers,
# T=100, buckets 448/398/50), export, and verify with the level-0 token
# quality gate using a training-style prompt (the OTHER utterance — see
# scripts/quality_gate.py on why self-prompting is out-of-distribution).
#
# Usage: bash scripts/make_bench_bundle.sh [workdir]
# Env:   BUNDLE_MAX_ITER (default 2000), BUNDLE_BATCH (default 16),
#        BUNDLE_OUT (default zoo/diffusion), BUNDLE_MIN_ACC (default 0.7)
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/tts_bench_bundle}
PKG=tts_with_diffusion_model_tpu
MAX_ITER=${BUNDLE_MAX_ITER:-2000}
BATCH=${BUNDLE_BATCH:-16}
OUT=${BUNDLE_OUT:-zoo/diffusion}
MIN_ACC=${BUNDLE_MIN_ACC:-0.7}

rm -rf "$WORK"
mkdir -p "$WORK/data/overfit/spk1"

python - "$WORK" << 'EOF'
import sys, wave
import numpy as np
from pathlib import Path
root = Path(sys.argv[1]) / "data/overfit/spk1"
sr = 24_000
for i, (f, text) in enumerate([(180, "hello there"), (240, "make some noise")]):
    t = np.linspace(0, 1.0, sr, endpoint=False)
    wav = (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    with wave.open(str(root / f"utt{i}.wav"), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes((wav * 32767).astype("<i2").tobytes())
    (root / f"utt{i}.normalized.txt").write_text(text)
EOF

python -m $PKG.emb.g2p "$WORK/data/overfit"
python -m $PKG.emb.qnt "$WORK/data/overfit"

cat > "$WORK/bundle.yml" << EOF
data_dirs: [$WORK/data/overfit]
spkr_name_getter: "parts:-2"
model: diffusion
batch_size: $BATCH
max_iter: $MAX_ITER
eval_every: 1000
save_ckpt_every: 500
warmup_max_lr: 5.0e-4
warmup_num_steps: 100
min_phones: 3
mesh_tp: 1
log_root: $WORK/logs
ckpt_root: $WORK/ckpts
ema_decay: 0.999
EOF

python -m $PKG.train "yaml=$WORK/bundle.yml" < /dev/null

python -m $PKG.export "$OUT" "yaml=$WORK/bundle.yml"
python scripts/quality_gate.py "$OUT" \
    "$WORK/data/overfit/spk1/utt0.wav" 'hello there' \
    --prompt-wav "$WORK/data/overfit/spk1/utt1.wav" --min-acc "$MIN_ACC"

echo "bench bundle ready at $OUT (trained $MAX_ITER steps, gate passed)"
