#!/bin/bash
# On-chip soak test: train the PRODUCTION-SIZE D3PM, SIGKILL it mid-run,
# relaunch through the crash-loop wrapper (scripts/run.sh), and assert the
# full fault-tolerance story end-to-end:
#
#   1. global_step resumes from the last checkpoint (not 0);
#   2. loss keeps decreasing across the kill;
#   3. the eval loop runs and logs eval losses;
#   4. the exported bundle passes the level-0 token quality gate.
#
# This is the operating model the reference ships (crash-loop run.sh +
# unconditional checkpoint resume, /root/reference/scripts/run.sh:3 +
# vall_e/utils/trainer.py:60-64), exercised here as one scripted check.
#
# Usage: bash scripts/soak.sh [workdir]
# Env:   SOAK_MAX_ITER (default 3000), SOAK_KILL_AFTER (seconds, default 240),
#        SOAK_BATCH (default 16), SOAK_MIN_ACC (default 0.7)
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/tts_soak}
PKG=tts_with_diffusion_model_tpu
MAX_ITER=${SOAK_MAX_ITER:-3000}
KILL_AFTER=${SOAK_KILL_AFTER:-240}
BATCH=${SOAK_BATCH:-16}
MIN_ACC=${SOAK_MIN_ACC:-0.7}

rm -rf "$WORK"
mkdir -p "$WORK/data/overfit/spk1"

# ---- toy overfit corpus (2 utterances, 1 speaker — the diffusion analogue
# of the reference's one-sample overfit convention, nar.py:149-165) ----
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

# ---- production-size D3PM config (NO model_overrides: registry defaults —
# d_model 512, 8 DiT layers, T=100, buckets 448/398/50) ----
cat > "$WORK/soak.yml" << EOF
data_dirs: [$WORK/data/overfit]
spkr_name_getter: "parts:-2"
model: diffusion
batch_size: $BATCH
max_iter: $MAX_ITER
eval_every: 1000
save_ckpt_every: 200
warmup_max_lr: 5.0e-4
warmup_num_steps: 100
min_phones: 3
mesh_tp: 1
log_root: $WORK/logs
ckpt_root: $WORK/ckpts
# exercise the round-3 training features under the kill/resume story:
# EMA rides checkpoints across the SIGKILL; remat is the default already
ema_decay: 0.999
eval_use_ema: false
EOF

LOG_DIR="$WORK/logs/tts_soak/soak"

# ---- phase 1: train, then SIGKILL mid-run (no pattern kills: exact PID).
# The kill fires once real progress exists: after the first checkpoint
# cadence has passed (>= 2*save_ckpt_every steps logged) plus KILL_AFTER
# more seconds of training — robust to multi-minute first compiles. ----
echo "soak: phase 1 — launching training (SIGKILL after checkpointed progress + ${KILL_AFTER}s)"
python -m $PKG.train "yaml=$WORK/soak.yml" < /dev/null > "$WORK/phase1.out" 2>&1 &
TRAIN_PID=$!
DEADLINE=$(( $(date +%s) + 3600 ))
while :; do
    if ! kill -0 "$TRAIN_PID" 2>/dev/null; then
        echo "soak: FAIL — training exited before the kill"
        tail -20 "$WORK/phase1.out"; exit 1
    fi
    # each launch logs under a fresh timestamped subdir — aggregate them
    STEPS=$(cat "$LOG_DIR"/*/log.txt 2>/dev/null | grep -c '"global_step"' || true)
    if [ "${STEPS:-0}" -ge 450 ]; then
        break
    fi
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
        echo "soak: FAIL — no checkpointed progress within 1h"
        kill -9 "$TRAIN_PID" 2>/dev/null || true
        tail -20 "$WORK/phase1.out"; exit 1
    fi
    sleep 10
done
sleep "$KILL_AFTER"
kill -9 "$TRAIN_PID" 2>/dev/null || {
    echo "soak: FAIL — training exited before the kill (too-short run?)"
    tail -20 "$WORK/phase1.out"; exit 1;
}
wait "$TRAIN_PID" 2>/dev/null || true
STEPS_BEFORE=$(cat "$LOG_DIR"/*/log.txt 2>/dev/null | grep -c '"global_step"' || true)
echo "soak: killed training at PID $TRAIN_PID after $STEPS_BEFORE logged steps"

# ---- phase 2: crash-loop relaunch; run.sh retries until clean exit ----
echo "soak: phase 2 — relaunching via run.sh until max_iter ($MAX_ITER)"
timeout 7200 bash scripts/run.sh \
    python -m $PKG.train "yaml=$WORK/soak.yml" < /dev/null \
    > "$WORK/phase2.out" 2>&1

# ---- assertions over the per-launch JSON-lines logs (kill + resume
# segments) — factored into a tested module (tests/test_scripts.py) ----
python scripts/soak_check.py "$LOG_DIR" "$MAX_ITER"

# ---- export + quality gate ----
# Prompt with the OTHER utterance (utt1): training prompts are sampled from
# other utterances of the speaker (reference data.py:136-155), so the
# production-size model memorizes the (text, prompt) pairing — prompting
# with the target itself is out-of-distribution on a 2-utterance corpus
# (measured 0.200 vs 1.000 level-0 accuracy; quality_gate.py docstring).
python -m $PKG.export "$WORK/zoo/diff" "yaml=$WORK/soak.yml"
python scripts/quality_gate.py "$WORK/zoo/diff" \
    "$WORK/data/overfit/spk1/utt0.wav" 'hello there' \
    --prompt-wav "$WORK/data/overfit/spk1/utt1.wav" --min-acc "$MIN_ACC"

echo "soak complete: killed at ~${KILL_AFTER}s, resumed, reached $MAX_ITER steps, quality gate passed"
