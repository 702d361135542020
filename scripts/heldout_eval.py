#!/usr/bin/env python
"""Full-stack held-out evaluation: trained first stage + trained NAR → wav.

The trainer's per-tick eval scores each stage separately (first stage vs
ground-truth level 0; NAR given ground-truth level 0).  This script measures
what a user gets: for N HELD-OUT (val-split) utterances, the trained first
stage generates level 0 from text + a same-speaker acoustic prompt, the
trained NAR fills levels 1-7, the full 8-level stack decodes to a wav, and
the wav/codes are scored against the ground-truth recording (per-level token
accuracy + DTW-MCD, ``utils/metrics.py``) — the two-stage chain of the
reference's CLI (``vall_e/__main__.py:66-73``) evaluated on data the models
never saw (split: the trainer's own 95/5 seed-0 partition via
``create_datasets``).

Prompts follow the training convention (``vall_e/data.py:136-155``): codes
of *other* utterances of the same speaker, drawn from the TRAIN split.

Usage:
  python scripts/heldout_eval.py FIRST_BUNDLE --nar-bundle NAR_BUNDLE \
      --out OUT.json yaml=TRAIN_CFG.yml [--n 16] [--resp-bucket 192] \
      [--decode ancestral|maskgit]
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from tts_with_diffusion_model_tpu.__main__ import build_model
    from tts_with_diffusion_model_tpu.config import Config
    from tts_with_diffusion_model_tpu.data.dataset import (
        create_datasets,
        get_phones,
        load_quants,
    )
    from tts_with_diffusion_model_tpu.export import load_bundle
    from tts_with_diffusion_model_tpu.text.symmap import phones_to_ids

    cfg = Config.from_cli()
    ap = argparse.ArgumentParser()
    ap.add_argument("bundle", type=Path)
    ap.add_argument("--nar-bundle", type=Path, required=True)
    ap.add_argument("--out", type=Path, default=Path("heldout_fullstack.json"))
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resp-bucket", type=int, default=192)
    ap.add_argument("--decode", choices=("ancestral", "maskgit"),
                    default="ancestral")
    ap.add_argument("--maskgit-steps", type=int, default=12)
    ap.add_argument("--nar-temperature", type=float, default=0.2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tts_with_diffusion_model_tpu.audio.wavio import read_wav
    from tts_with_diffusion_model_tpu.emb import qnt
    from tts_with_diffusion_model_tpu.models.nar import nar_generate
    from tts_with_diffusion_model_tpu.utils.metrics import (
        aggregate_metrics,
        eval_utterance_metrics,
        mel_cepstral_distortion,
    )

    params, meta, phone_symmap, _ = load_bundle(args.bundle)
    model = build_model(meta)
    c = model.config
    nar_params, nar_meta, _, _ = load_bundle(args.nar_bundle)
    nar = build_model(nar_meta)

    train_ds, val_ds = create_datasets(cfg)
    get_spkr = train_ds.get_spkr
    train_by_spkr = defaultdict(list)
    for p in train_ds.paths:
        train_by_spkr[get_spkr(p)].append(p)

    # held-out utterances whose speaker has train-split prompts available
    rng = np.random.default_rng(args.seed)
    vals = [p for p in val_ds.paths if train_by_spkr[get_spkr(p)]]
    assert vals, "no val utterance has same-speaker train prompts"
    picks = [vals[i] for i in rng.choice(len(vals),
                                         size=min(args.n, len(vals)),
                                         replace=False)]

    N, bucket = len(picks), args.resp_bucket
    text = np.zeros((N, c.text_len), np.int32)
    tm = np.zeros((N, c.text_len), np.float32)
    pr = np.zeros((N, c.prom_len, 8), np.int32)
    pm = np.zeros((N, c.prom_len), np.float32)
    refs = []
    for i, p in enumerate(picks):
        ids = phones_to_ids(list(get_phones(p)), phone_symmap,
                            strict=False)[: c.text_len]
        text[i, : len(ids)] = ids
        tm[i, : len(ids)] = 1.0
        pool = train_by_spkr[get_spkr(p)]
        take = rng.choice(len(pool), size=min(3, len(pool)), replace=False)
        q = np.concatenate([load_quants(pool[j]) for j in take],
                           axis=0)[: c.prom_len]
        pr[i, : q.shape[0]] = q
        pm[i, : q.shape[0]] = 1.0
        refs.append(np.asarray(load_quants(p)))  # (t, 8)

    # One batched first-stage call (fixed bucket → one compile); the D3PM
    # generates a fixed window — score each row on its reference's span,
    # the trainer's own convention (train/train.py decode_eval_audio).
    key = jax.random.PRNGKey(args.seed)
    gl = min(bucket, c.gen_len)
    if args.decode == "maskgit":
        out = model.generate_maskgit(
            params, jnp.asarray(text), jnp.asarray(tm), jnp.asarray(pr),
            jnp.asarray(pm), key, gen_len=gl, resp_bucket=bucket,
            steps=args.maskgit_steps)
    else:
        out = model.generate(
            params, jnp.asarray(text), jnp.asarray(tm), jnp.asarray(pr),
            jnp.asarray(pm), key, gen_len=gl, resp_bucket=bucket)
    rm = np.zeros((N, bucket), np.float32)
    for i, ref in enumerate(refs):
        rm[i, : min(len(ref), gl)] = 1.0
    resps = nar_generate(
        nar, nar_params, jnp.asarray(text), jnp.asarray(tm), jnp.asarray(pr),
        jnp.asarray(pm), out[:, :bucket], jnp.asarray(rm),
        jax.random.PRNGKey(args.seed + 1),
        sampling_temperature=args.nar_temperature)

    per_utt = []
    for i, (p, ref) in enumerate(zip(picks, refs)):
        span = min(len(ref), gl)
        hyp = np.asarray(resps[i][:span])          # (span, 8)
        hyp_wav, sr = qnt.decode(hyp.T)
        hyp_wav = np.asarray(hyp_wav).reshape(-1)
        ref_wav, _ = read_wav(p.parent / (p.name.split(".")[0] + ".wav"))
        ref_wav = np.asarray(ref_wav).reshape(-1)
        # ``mcd`` scores against the codec ROUND-TRIP of the ground-truth
        # codes, so both sides share the codec and the number isolates the
        # TTS stack (the trainer-eval convention, train/train.py).  The
        # raw-recording comparison is kept as ``mcd_vs_raw`` next to the
        # utterance's own ``codec_floor_mcd`` (round-trip vs raw): on this
        # synthetic corpus pure-tone spectral valleys make any codec's
        # absolute floor enormous (~350), swamping stack quality.
        rt_wav, _ = qnt.decode(np.asarray(ref[:span]).T)
        rt_wav = np.asarray(rt_wav).reshape(-1)
        m = eval_utterance_metrics(
            hyp, ref[:span], hyp_wav=hyp_wav, ref_wav=rt_wav, sr=sr)
        m["mcd_vs_raw"] = mel_cepstral_distortion(hyp_wav, ref_wav, sr)["mcd"]
        m["codec_floor_mcd"] = mel_cepstral_distortion(
            rt_wav, ref_wav, sr)["mcd"]
        per_utt.append(m)

    mean = aggregate_metrics(per_utt)
    for m, p in zip(per_utt, picks):
        m["path"] = str(p)
    summary = {
        "n_utts": N,
        "decode": args.decode,
        "bundle": str(args.bundle),
        "nar_bundle": str(args.nar_bundle),
        "split": "val (trainer 95/5 seed-0; eval ∩ train = ∅)",
        "mean": {k: round(float(v), 4) for k, v in mean.items()
                 if isinstance(v, (int, float))},
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(
        {"summary": summary, "per_utt": per_utt}, indent=1, default=str))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
