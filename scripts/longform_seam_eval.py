#!/usr/bin/env python
"""Long-form seam evidence on TRAINED weights (round-3 VERDICT weak #7).

Chains segments for a long text with the trained first stage + NAR, decodes
the concatenated code stream in one convolutional pass, and reports the
seam spectral-flux ratio at every join (utils/metrics.py
seam_spectral_flux) next to the hard-splice alternative — the number behind
``longform.py``'s seam-free claim (tests/test_longform.py pins the
invariant on random weights; this records it on a trained stack).

Usage:
  python scripts/longform_seam_eval.py FIRST_BUNDLE NAR_BUNDLE REF_WAV \
      --out OUT.json [--text "..."] [--seed 11]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# in-vocabulary for the gen-r4 synthetic corpus (scripts/make_gen_corpus.py
# VOCAB) so the trained models see familiar phones; long enough to force
# several segments at the production 50-phone bucket
DEFAULT_TEXT = (
    "anchor bright copper drift ember fable glide harbor island jasper "
    "kettle lumen marble north orbit pepper quiver river stone timber "
    "under velvet willow yonder zephyr amber birch cedar dune elm fern "
    "grove hazel iris juniper lark maple oak pine reed"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("first_bundle")
    ap.add_argument("nar_bundle")
    ap.add_argument("ref_wav")
    ap.add_argument("--out", required=True)
    ap.add_argument("--text", default=DEFAULT_TEXT)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--segment-budget", type=int, default=None,
                    help="phones per segment (default: the synthesizer's)")
    args = ap.parse_args()

    from tts_with_diffusion_model_tpu.codec.encodec import HOP
    from tts_with_diffusion_model_tpu.longform import iter_segment_codes
    from tts_with_diffusion_model_tpu.serve import Synthesizer
    from tts_with_diffusion_model_tpu.utils.metrics import seam_spectral_flux

    synth = Synthesizer(args.first_bundle, args.nar_bundle)

    kw = {}
    if args.segment_budget:
        kw["max_segment_phones"] = args.segment_budget
    pieces = list(iter_segment_codes(
        synth, args.text, args.ref_wav, seed=args.seed, **kw))
    if len(pieces) < 2:
        print(json.dumps({"error": "text produced a single segment — "
                          "lengthen it or shrink --segment-budget"}))
        sys.exit(1)
    boundaries = np.cumsum([p.shape[0] for p in pieces])[:-1] * HOP

    one_shot, sr = synth.decode_codes(np.concatenate(pieces, axis=0))
    spliced = np.concatenate(
        [synth.decode_codes(p)[0] for p in pieces], axis=-1)

    seam_one = seam_spectral_flux(one_shot, sr, boundaries)
    seam_spl = seam_spectral_flux(spliced, sr, boundaries)
    out = {
        "n_segments": len(pieces),
        "total_frames": int(sum(p.shape[0] for p in pieces)),
        "one_shot": {k: v for k, v in seam_one.items()},
        "hard_splice": {k: v for k, v in seam_spl.items()},
        "seam_free": bool(
            seam_one["seam_flux_ratio_max"]
            <= seam_spl["seam_flux_ratio_max"] + 1e-6
        ),
    }
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps({"out": args.out,
                      "one_shot_max": seam_one["seam_flux_ratio_max"],
                      "splice_max": seam_spl["seam_flux_ratio_max"],
                      "seam_free": out["seam_free"]}))


if __name__ == "__main__":
    main()
