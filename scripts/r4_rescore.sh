#!/bin/bash
# Re-score the round-4 full-stack evidence with the codec-controlled MCD
# decomposition (mcd / mcd_vs_raw / codec_floor_mcd — scripts/heldout_eval.py,
# scripts/quality_gate.py).  The original stage-3 files were produced before
# the decomposition landed; token-accuracy fields are unaffected, only the
# MCD semantics change.  Run AFTER scripts/gen_evidence_v2_all.sh (needs the
# trained zoo in $WORK and the serving zoo installed in the repo).
#
# Usage: bash scripts/r4_rescore.sh [workdir] [evidence_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/gen4b}
EVID=${2:-benchmarks/gen_r4}
CODEC=${CODEC:-/tmp/gen4/encodec_gen4.npz}
CFG=config/gen4b/diffusion.yml
export ENCODEC_WEIGHTS="$CODEC"

python scripts/heldout_eval.py "$WORK/zoo/diffusion" \
    --nar-bundle "$WORK/zoo/nar" --n 16 \
    --out "$EVID/heldout_fullstack_v2_bestloss.json" "yaml=$CFG"
python scripts/heldout_eval.py "$WORK/zoo/diffusion_last" \
    --nar-bundle "$WORK/zoo/nar" --n 16 \
    --out "$EVID/heldout_fullstack_v2_last.json" "yaml=$CFG"
# serving candidate (diffusion_last won stage 3's selection)
cp "$EVID/heldout_fullstack_v2_last.json" "$EVID/heldout_fullstack_v2.json"
python scripts/heldout_eval.py "$WORK/zoo/diffusion_last" \
    --nar-bundle "$WORK/zoo/nar" --n 16 --decode maskgit \
    --out "$EVID/heldout_fullstack_v2_maskgit.json" "yaml=$CFG"

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
python scripts/quality_gate.py "$WORK/zoo/diffusion_last" "$VAL_WAV" \
    "$(cat "$VAL_TXT")" --prompt-wav "$PROMPT_WAV" \
    --nar-bundle "$WORK/zoo/nar" --min-acc 0 \
    | head -1 > "$EVID/heldout_gate_v2.json"

echo "rescore done -> $EVID"
