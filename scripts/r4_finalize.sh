#!/bin/bash
# End-of-round checklist (round-4 origin, round-5 artifact set): run AFTER
# scripts/make_aux_bundles.sh prints ALL DONE (the chip and the single CPU
# core are then free).  Verifies every trained-evidence artifact exists and
# is well-formed, the test suite is green, and the driver entry points work
# against the trained serving zoo.  Prints a PASS/FAIL summary; exits 0 only
# if everything passed.
#
# Usage: bash scripts/r4_finalize.sh [evidence_dir]
set -uo pipefail
cd "$(dirname "$0")/.."
EVID=${1:-benchmarks/gen_r4}
fail=0
note() { echo "[finalize] $*"; }
check() { # check <label> <file>
  if [ -e "$2" ]; then note "PASS  $1 ($2)"; else note "FAIL  $1 ($2 missing)"; fail=1; fi
}
check_jsonl() { # check_jsonl <label> <file>: exists AND non-empty valid JSONL
  if [ -s "$2" ] && python - "$2" <<'EOF'
import json, sys
rows = [line for line in open(sys.argv[1]) if line.strip()]
assert rows, "empty"
for line in rows:
    json.loads(line)
EOF
  then note "PASS  $1 ($2)"; else note "FAIL  $1 ($2 missing/empty/invalid)"; fail=1; fi
}

note "== 1/4 trained evidence files =="
# gen4b full-scale headline generalization chain (committed round 4)
check "held-out D3PM full-stack eval (gen4b)" "$EVID/heldout_fullstack_v2.json"
check "speaker transfer (serving, gen4b)"     "$EVID/transfer_eval_v2_serving.json"
check "long-form seams (trained, gen4b)"      "$EVID/longform_seam_v2.json"
# gen4c session-scale consistent zoo + aux artifacts (the gen4b AR/NAR
# bundles were lost to a VM reboot; scripts/make_aux_bundles.sh rebuilds
# the same artifact types on the 256-utt mini corpus, config/gen4c/*.yml,
# with the WHOLE serving zoo calibrated/trained against one codec)
check "held-out AR full-stack eval (mini)"    "$EVID/heldout_fullstack_ar_mini_v2.json"
check "held-out D3PM full-stack eval (mini)"  "$EVID/heldout_fullstack_mini_v3.json"
check "full-stack speaker attribution (mini)" "$EVID/transfer_eval_fullstack_mini_v2.json"
check "speculative decoding (trained)"        "$EVID/spec_decode_mini_v2.json"
check_jsonl "e2e timing (trained bundles)"    "$EVID/full_pipeline_trained_mini_v2.jsonl"
check_jsonl "training sweeps"                 "$EVID/sweeps/diffusion_flash.jsonl"
check "trained serving bundle (D3PM)"         "zoo/diffusion/params.npz"
check "trained NAR bundle"                    "zoo/nar/params.npz"
check "trained AR bundle (README quickstart)" "zoo/ar/params.npz"
check "serving codec (same calibration)"      "zoo/encodec_24khz.npz"

note "== 2/4 test suite (quick markers, CPU virtual mesh) =="
if timeout 2400 python -m pytest tests/ -x -q -m "not slow" \
     2>&1 | tail -3; then
  note "PASS  quick suite"
else
  note "FAIL  quick suite"; fail=1
fi

note "== 3/4 driver entry points =="
if timeout 1800 env XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python -c \
     "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"; then
  note "PASS  dryrun_multichip(8)"
else
  note "FAIL  dryrun_multichip(8)"; fail=1
fi

note "== 4/4 bench.py (real chip, trained weights) =="
if timeout 1200 python bench.py | tail -1; then
  note "PASS  bench.py"
else
  note "FAIL  bench.py"; fail=1
fi

if [ "$fail" = 0 ]; then note "ALL CHECKS PASSED"; else note "CHECKS FAILED"; fi
exit $fail
