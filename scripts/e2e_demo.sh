#!/bin/bash
# End-to-end workflow demo (≡ the reference's workflow notebook
# config/test/Untitled-1.ipynb): synthesize a toy dataset, preprocess,
# train AR + NAR briefly, export bundles, and run zero-shot synthesis.
#
# Usage: bash scripts/e2e_demo.sh [workdir]
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/tts_demo}
PKG=tts_with_diffusion_model_tpu

mkdir -p "$WORK/data/train/spk1"
python - "$WORK" << 'EOF'
import sys, numpy as np
from pathlib import Path
root = Path(sys.argv[1]) / "data/train/spk1"
rng = np.random.default_rng(0)
sr = 24_000
for i in range(6):
    t = np.linspace(0, 1.0, sr, endpoint=False)
    f = 160 + 40 * i
    wav = (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    import wave
    with wave.open(str(root / f"utt{i}.wav"), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes((wav * 32767).astype("<i2").tobytes())
    (root / f"utt{i}.normalized.txt").write_text(
        ["hello there", "good day", "make some noise", "one two three",
         "testing audio", "the quick fox"][i])
EOF

python -m $PKG.emb.g2p "$WORK/data/train"
python -m $PKG.emb.qnt "$WORK/data/train"

cat > "$WORK/demo_ar.yml" << EOF
data_dirs: [$WORK/data/train]
spkr_name_getter: "parts:-2"
model: ar
model_overrides: {d_model: 64, n_heads: 4, n_layers: 2}
batch_size: 2
max_iter: 10
eval_every: 10
save_ckpt_every: 10
min_phones: 3
mesh_tp: 1
log_root: $WORK/logs
ckpt_root: $WORK/ckpts
EOF
sed 's/model: ar$/model: nar/; s/demo_ar/demo_nar/' "$WORK/demo_ar.yml" > "$WORK/demo_nar.yml"

python -m $PKG.train "yaml=$WORK/demo_ar.yml"
python -m $PKG.train "yaml=$WORK/demo_nar.yml"

python -m $PKG.export "$WORK/zoo/ar" "yaml=$WORK/demo_ar.yml"
python -m $PKG.export "$WORK/zoo/nar" "yaml=$WORK/demo_nar.yml"

python -m $PKG 'I am here to make some noise' \
    "$WORK/data/train/spk1/utt0.wav" "$WORK/out.wav" \
    --ar-ckpt "$WORK/zoo/ar" --nar-ckpt "$WORK/zoo/nar" --max-ar-steps 40

echo "AR/NAR demo complete: $WORK/out.wav"

# ---- diffusion first stage: train → export → synthesize → QUALITY GATE ----
# Overfit corpus: two utterances of one speaker (the diffusion analogue of
# the reference's one-sample overfit convention, nar.py:149-165).
mkdir -p "$WORK/data/overfit/spk1"
cp "$WORK/data/train/spk1/utt0."* "$WORK/data/train/spk1/utt1."* \
   "$WORK/data/overfit/spk1/"

cat > "$WORK/demo_diff.yml" << EOF
data_dirs: [$WORK/data/overfit]
spkr_name_getter: "parts:-2"
model: diffusion
model_overrides: {d_model: 128, n_heads: 4, n_layers: 2, timesteps: 20,
                  resp_len: 96, text_len: 24, prom_len: 160, gen_len: 80}
batch_size: 2
max_iter: 500
eval_every: 500
save_ckpt_every: 500
warmup_max_lr: 1.0e-3
warmup_num_steps: 50
min_phones: 3
mesh_tp: 1
log_root: $WORK/logs
ckpt_root: $WORK/ckpts
EOF

python -m $PKG.train "yaml=$WORK/demo_diff.yml"
python -m $PKG.export "$WORK/zoo/diff" "yaml=$WORK/demo_diff.yml"

# CLI synthesis through the diffusion first stage + NAR
python -m $PKG 'make some noise' \
    "$WORK/data/train/spk1/utt0.wav" "$WORK/out_diff.wav" \
    --ar-ckpt "$WORK/zoo/diff" --nar-ckpt "$WORK/zoo/nar"

# Gate: the overfit model must reproduce the training utterance's level-0
# tokens (>=70% accuracy) — exits nonzero on quality regression.
# Prompt with the OTHER utterance — the training prompt convention samples
# from other utterances of the speaker (reference data.py:136-155); see
# quality_gate.py docstring for the measured OOD effect at production size.
python scripts/quality_gate.py "$WORK/zoo/diff" \
    "$WORK/data/overfit/spk1/utt0.wav" 'hello there' \
    --prompt-wav "$WORK/data/overfit/spk1/utt1.wav" --min-acc 0.7

echo "demo complete: $WORK/out.wav $WORK/out_diff.wav (quality gate passed)"
