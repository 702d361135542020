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

The first-stage bundle may be any diffusion-family model (fixed-window
``generate``/``generate_maskgit``) or the AR (the reference's primary
first stage, ``ar.py:86-169``): AR bundles are auto-detected and decoded
with ``ar_generate`` (stop-token pruned, model-chosen lengths — scored
exactly like the trainer's AR eval, ``train/train.py decode_eval_audio``).

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
    ap.add_argument("--ar-temperature", type=float, default=1.0)
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
    is_ar = meta["model"].lower().startswith("ar")
    bucket = args.resp_bucket
    if is_ar:
        # The AR has no fixed windows (packed positions); build inputs at
        # the training regime's shapes (config/gen4b/ar.yml buckets).
        text_len = cfg.max_text_len
        prom_cap = getattr(cfg, "prom_len_buckets", None)
        prom_len = min(cfg.max_prom_len, max(prom_cap) if prom_cap else cfg.max_prom_len)
        gl = bucket
    else:
        c = model.config
        text_len, prom_len = c.text_len, c.prom_len
        gl = min(bucket, c.gen_len)
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

    N = len(picks)
    text = np.zeros((N, text_len), np.int32)
    tm = np.zeros((N, text_len), np.float32)
    pr = np.zeros((N, prom_len, 8), np.int32)
    pm = np.zeros((N, prom_len), np.float32)
    refs = []
    for i, p in enumerate(picks):
        ids = phones_to_ids(list(get_phones(p)), phone_symmap,
                            strict=False)[: text_len]
        text[i, : len(ids)] = ids
        tm[i, : len(ids)] = 1.0
        pool = train_by_spkr[get_spkr(p)]
        take = rng.choice(len(pool), size=min(3, len(pool)), replace=False)
        q = np.concatenate([load_quants(pool[j]) for j in take],
                           axis=0)[: prom_len]
        pr[i, : q.shape[0]] = q
        pm[i, : q.shape[0]] = 1.0
        refs.append(np.asarray(load_quants(p)))  # (t, 8)

    # One batched first-stage call (fixed bucket → one compile); the D3PM
    # generates a fixed window — score each row on its reference's span,
    # the trainer's own convention (train/train.py decode_eval_audio).
    # The AR chooses its own lengths (stop token): score each row on its
    # generated span, with ``len_ratio`` reporting pacing.
    key = jax.random.PRNGKey(args.seed)
    if is_ar:
        from tts_with_diffusion_model_tpu.models.ar import ar_generate

        toks, lens = ar_generate(
            model, params, jnp.asarray(text), jnp.asarray(tm),
            jnp.asarray(pr), jnp.asarray(pm), key, max_steps=bucket,
            sampling_temperature=args.ar_temperature)
        gen_lens = np.minimum(np.asarray(lens), bucket).astype(np.int64)
        # junk past each stop token (and the stop id itself) must not reach
        # the NAR's level-0 embedding table: zero outside the valid span
        level0 = np.where(
            np.arange(bucket)[None, :] < gen_lens[:, None],
            np.clip(np.asarray(toks)[:, :bucket], 0, model.n_tokens - 1), 0)
        out = jnp.asarray(level0.astype(np.int32))
        rm = (np.arange(bucket)[None, :]
              < gen_lens[:, None]).astype(np.float32)
    elif args.decode == "maskgit":
        out = model.generate_maskgit(
            params, jnp.asarray(text), jnp.asarray(tm), jnp.asarray(pr),
            jnp.asarray(pm), key, gen_len=gl, resp_bucket=bucket,
            steps=args.maskgit_steps)
    else:
        out = model.generate(
            params, jnp.asarray(text), jnp.asarray(tm), jnp.asarray(pr),
            jnp.asarray(pm), key, gen_len=gl, resp_bucket=bucket)
    if not is_ar:
        rm = np.zeros((N, bucket), np.float32)
        for i, ref in enumerate(refs):
            rm[i, : min(len(ref), gl)] = 1.0
    resps = nar_generate(
        nar, nar_params, jnp.asarray(text), jnp.asarray(tm), jnp.asarray(pr),
        jnp.asarray(pm), out[:, :bucket], jnp.asarray(rm),
        jax.random.PRNGKey(args.seed + 1),
        sampling_temperature=args.nar_temperature)

    from tts_with_diffusion_model_tpu.codec.encodec import HOP

    def decode_rows(rows):
        """Batch-decode variable-length (t, 8) code rows in ONE codec
        program (the ``train/train.py decode_eval_audio`` convention): a
        per-row exact-length decode compiles one XLA program per DISTINCT
        length — with the AR's model-chosen lengths that is up to 2·N
        tunnel compiles.  Pad every row to the batch max rounded up to 64
        frames (edge-replicated codes so the convolutional decoder sees
        signal-like context, not a zero cliff), decode once, slice each
        wav back to its row's t·HOP samples; the few receptive-field
        frames near the tail differ imperceptibly from an exact decode."""
        lens = [len(r) for r in rows]
        T = -(-max(lens) // 64) * 64
        padded = np.stack([
            np.concatenate([r, np.repeat(r[-1:], T - len(r), axis=0)],
                           axis=0)
            for r in rows
        ])  # (n, T, 8)
        wavs, sr = qnt.decode(np.moveaxis(padded, 1, 2))
        return [np.asarray(wavs[i][: lens[i] * HOP]).reshape(-1)
                for i in range(len(rows))], sr

    items = []  # (path, ref, span, hyp-or-None)
    rows = []
    for i, (p, ref) in enumerate(zip(picks, refs)):
        span = min(len(ref), gl)
        hspan = int(gen_lens[i]) if is_ar else span
        if hspan == 0:  # AR emitted an immediate stop (trainer convention)
            items.append((p, ref, span, None))
            continue
        hyp = np.asarray(resps[i][:hspan])         # (hspan, 8)
        items.append((p, ref, span, hyp))
        rows.append(hyp)
        rows.append(np.asarray(ref[:span]))
    wavs, sr = decode_rows(rows) if rows else ([], 24_000)
    wav_it = iter(wavs)

    per_utt = []
    for p, ref, span, hyp in items:
        if hyp is None:
            per_utt.append({"len_ratio": 0.0, "acc": 0.0})
            continue
        hyp_wav = next(wav_it)
        rt_wav = next(wav_it)
        ref_wav, _ = read_wav(p.parent / (p.name.split(".")[0] + ".wav"))
        ref_wav = np.asarray(ref_wav).reshape(-1)
        # ``mcd`` scores against the codec ROUND-TRIP of the ground-truth
        # codes, so both sides share the codec and the number isolates the
        # TTS stack (the trainer-eval convention, train/train.py).  The
        # raw-recording comparison is kept as ``mcd_vs_raw`` next to the
        # utterance's own ``codec_floor_mcd`` (round-trip vs raw): on this
        # synthetic corpus pure-tone spectral valleys make any codec's
        # absolute floor enormous (~350), swamping stack quality.
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
        "first_stage": meta["model"],
        "decode": ("ar" if is_ar else args.decode),
        **({"ar_temperature": args.ar_temperature} if is_ar else {}),
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
    # dodge the axon-tunnel teardown wedge (utils/helpers.py)
    from tts_with_diffusion_model_tpu.utils.helpers import (  # noqa: E402
        hard_exit_if_tunnel,
    )

    hard_exit_if_tunnel()
