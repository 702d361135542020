#!/usr/bin/env python
"""Speaker-prompt transfer evaluation: does the prompt pathway steer the voice?

The thesis capability of the reference is zero-shot speaker-prompted TTS:
the acoustic prompt (codes of reference audio) must pull the generated
utterance toward the prompted speaker (`/root/reference/vall_e/data.py:136-155`
builds training pairs for exactly this).  Nothing in a loss curve proves the
pathway is used — a model can minimize CE while ignoring the prompt.  This
script measures the effect directly:

  1. Build per-speaker "voiceprints": level-0 code unigram distributions
     from the TRAINING split (the trainer's own 95/5 seed-0 split via
     ``create_datasets`` — no private re-splitting).
  2. For each trial, take the text of a HELD-OUT (val-split) utterance and
     synthesize it twice with the same seed: once prompted with speaker A's
     training audio, once with speaker B's (A ≠ B drawn per trial).
  3. Classify each generation against {A, B} voiceprints (L1 on unigram
     histograms).  Transfer accuracy = fraction of generations attributed
     to their prompted speaker; margin = distance(other) − distance(prompted).

A prompt-deaf model scores ~0.5 (chance); a speaker-cloning model scores
near 1.0 with positive margins.  Also reports 32-way attribution for
context.

Usage:
  python scripts/speaker_transfer_eval.py BUNDLE_DIR --out OUT.json \
      yaml=CFG.yml [--trials 32] [--frames 160] [--resp-bucket 256] \
      [--nar-bundle NAR_DIR]

The yaml must be the training config (its data_dirs/split recreate the
exact train/val partition the model saw).

With ``--nar-bundle`` the attribution is measured on the FULL SERVED
STACK (round-4 VERDICT item 5): first-stage level-0 codes → trained NAR
fills levels 1-7 → codec decode to a waveform → the waveform is
RE-ENCODED through the codec and its level-0 codes are attributed against
the same training voiceprints.  The scoring space is unchanged, but the
signal now travels the complete chain users hear (first stage → NAR →
wav); a NAR or codec stage that lost the prompted voice would collapse
the attribution.  Without the flag, behavior is the round-4 first-stage
measurement (codes scored directly).
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def code_hist(codes: np.ndarray, bins: int = 1024) -> np.ndarray:
    h = np.bincount(np.asarray(codes, np.int64).ravel(), minlength=bins)
    h = h.astype(np.float64)
    return h / max(h.sum(), 1.0)


def main():
    from tts_with_diffusion_model_tpu.__main__ import build_model
    from tts_with_diffusion_model_tpu.config import Config
    from tts_with_diffusion_model_tpu.data.dataset import (
        create_datasets,
        load_quants,
    )
    from tts_with_diffusion_model_tpu.export import load_bundle
    from tts_with_diffusion_model_tpu.text.symmap import phones_to_ids

    cfg = Config.from_cli()
    ap = argparse.ArgumentParser()
    ap.add_argument("bundle", type=Path)
    ap.add_argument("--out", type=Path, default=Path("transfer_eval.json"))
    ap.add_argument("--trials", type=int, default=32)
    ap.add_argument("--frames", type=int, default=160,
                    help="classify over the first N generated frames")
    ap.add_argument("--resp-bucket", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--nar-bundle", type=Path, default=None,
                    help="score the full first-stage→NAR→wav→re-encode "
                         "chain instead of first-stage codes")
    ap.add_argument("--nar-temperature", type=float, default=0.2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    params, meta, phone_symmap, _ = load_bundle(args.bundle)
    model = build_model(meta)
    c = model.config

    train_ds, val_ds = create_datasets(cfg)
    get_spkr = train_ds.get_spkr

    # ---- voiceprints from the TRAIN split only
    train_by_spkr = defaultdict(list)
    for p in train_ds.paths:
        train_by_spkr[get_spkr(p)].append(p)
    voiceprint = {}
    train_codes = {}
    for s, paths in sorted(train_by_spkr.items()):
        codes = [load_quants(p) for p in paths]  # (t, 8) each
        train_codes[s] = codes
        voiceprint[s] = code_hist(
            np.concatenate([q[:, 0] for q in codes]))
    speakers = sorted(voiceprint)
    assert len(speakers) >= 2, "need >= 2 speakers for transfer trials"

    # ---- held-out texts (val split): eval ∩ train = ∅ by construction
    val_paths = list(val_ds.paths)
    assert val_paths, "empty val split"

    rng = np.random.default_rng(args.seed)

    def make_prompt(s: str, trial_rng) -> np.ndarray:
        """Concat up to 3 training utterances of speaker s → (prom_len, 8)."""
        pool = train_codes[s]
        take = trial_rng.choice(len(pool), size=min(3, len(pool)),
                                replace=False)
        q = np.concatenate([pool[i] for i in take], axis=0)[: c.prom_len]
        proms = np.zeros((c.prom_len, 8), np.int32)
        proms[: q.shape[0]] = q
        pm = np.zeros((c.prom_len,), np.float32)
        pm[: q.shape[0]] = 1.0
        return proms, pm

    from tts_with_diffusion_model_tpu.data.dataset import get_phones

    # generation length must fit the tightened bucket (generate raises on
    # resp_bucket < gen_len); the corpus' utterances are well under it
    gl = min(args.resp_bucket, c.gen_len)
    gen_jit = jax.jit(
        lambda p, text, tm, proms, pm, r: model.generate(
            p, text, tm, proms, pm, r, gen_len=gl,
            resp_bucket=args.resp_bucket)
    )

    fullstack = args.nar_bundle is not None
    if fullstack:
        from tts_with_diffusion_model_tpu.emb import qnt
        from tts_with_diffusion_model_tpu.models.nar import nar_generate

        nar_params, nar_meta, _, _ = load_bundle(args.nar_bundle)
        nar = build_model(nar_meta)

        def to_wav_codes(level0, text, tm, proms, pm, key):
            """level-0 (1, bucket) → NAR levels 1-7 → wav → re-encoded
            level-0 codes (the complete served chain).  All shapes fixed
            (full gl window) so each stage compiles exactly once."""
            rm = jnp.ones((1, args.resp_bucket), jnp.float32)
            resps = nar_generate(
                nar, nar_params, text, tm, proms, pm,
                level0[:, : args.resp_bucket], rm, key,
                sampling_temperature=args.nar_temperature)
            codes8 = np.asarray(resps[0][:gl])            # (gl, 8)
            wavs, sr = qnt.decode(np.moveaxis(codes8[None], 1, 2))
            wav = np.asarray(wavs[0]).reshape(-1)
            re = qnt.encode(wav, sr)                      # (8, t)
            return np.asarray(re[0])                      # level-0 codes

    results = []
    for trial in range(args.trials):
        trng = np.random.default_rng(args.seed * 100_003 + trial)
        a, b = trng.choice(len(speakers), size=2, replace=False)
        spk_a, spk_b = speakers[a], speakers[b]
        vp = val_paths[trng.integers(len(val_paths))]
        ids = phones_to_ids(list(get_phones(vp)), phone_symmap, strict=False)
        ids = ids[: c.text_len]
        text = np.zeros((1, c.text_len), np.int32)
        text[0, : len(ids)] = ids
        tm = np.zeros((1, c.text_len), np.float32)
        tm[0, : len(ids)] = 1.0

        row = {"val_path": str(vp), "prompted": [spk_a, spk_b]}
        for tag, spk in (("a", spk_a), ("b", spk_b)):
            proms, pm = make_prompt(spk, trng)
            jt, jtm = jnp.asarray(text), jnp.asarray(tm)
            jp, jpm = jnp.asarray(proms)[None], jnp.asarray(pm)[None]
            key = jax.random.PRNGKey(args.seed * 7 + trial)
            out = gen_jit(params, jt, jtm, jp, jpm, key)
            if fullstack:
                codes = to_wav_codes(
                    out, jt, jtm, jp, jpm,
                    jax.random.fold_in(key, 1))[: args.frames]
            else:
                codes = np.asarray(out[0])[: args.frames]
            h = code_hist(codes)
            d_a = float(np.abs(h - voiceprint[spk_a]).sum())
            d_b = float(np.abs(h - voiceprint[spk_b]).sum())
            d_all = {s: float(np.abs(h - voiceprint[s]).sum())
                     for s in speakers}
            prompted_d = d_a if spk == spk_a else d_b
            other_d = d_b if spk == spk_a else d_a
            row[tag] = {
                "speaker": spk,
                "correct_2way": prompted_d < other_d,
                "margin": other_d - prompted_d,
                "pred_32way": min(d_all, key=d_all.get),
            }
        results.append(row)

    gens = [row[t] for row in results for t in ("a", "b")]
    acc2 = float(np.mean([g["correct_2way"] for g in gens]))
    margin = float(np.mean([g["margin"] for g in gens]))
    acc32 = float(np.mean([g["pred_32way"] == g["speaker"] for g in gens]))
    summary = {
        "n_trials": args.trials,
        "n_generations": len(gens),
        "transfer_accuracy_2way": acc2,
        "mean_margin": margin,
        "attribution_accuracy_full": acc32,
        "n_speakers": len(speakers),
        "chance_2way": 0.5,
        "chance_full": 1.0 / len(speakers),
        "bundle": str(args.bundle),
        "frames_scored": args.frames,
        "stack": ("fullstack:first+nar+wav+reencode" if fullstack
                  else "first_stage_codes"),
        "nar_bundle": str(args.nar_bundle) if fullstack else None,
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(
        {"summary": summary, "trials": results}, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
    # dodge the axon-tunnel teardown wedge (utils/helpers.py)
    from tts_with_diffusion_model_tpu.utils.helpers import (  # noqa: E402
        hard_exit_if_tunnel,
    )

    hard_exit_if_tunnel()
