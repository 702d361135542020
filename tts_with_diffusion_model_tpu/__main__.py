"""Zero-shot TTS inference CLI (≡ ``vall_e/__main__.py:44-77``).

    python -m tts_with_diffusion_model_tpu '<text>' <ref.wav> <out.wav> \
        [--ar-ckpt zoo/ar] [--nar-ckpt zoo/nar] [--temperature 1.0]

Pipeline: reference wav → EnCodec codes (prompt) ; text → phones → ids ;
first stage (AR **or** diffusion bundle — dispatched on the exported model
family, covering both the reference's default AR path and its commented
``generate_audio`` diffusion path, ``__main__.py:12-43``) → level-0 tokens ;
NAR fills levels 2-8 ; EnCodec decode → wav.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

#: AR long-form engagement threshold ≡ the serving text bucket and the
#: reference's training-time ``max_phones`` (``vall_e/config.py:44``).
AR_TEXT_BUCKET = 50


def first_stage_generate(meta, model, params, phn_ids, proms, rng, args):
    """Run the AR or diffusion first stage → level-0 token array (t,)."""
    from .models.ar import ar_generate
    from .models.diffusion import DiffusionModel
    from .models.gaussian_tts import GaussianDiffusionModel

    if isinstance(model, (DiffusionModel, GaussianDiffusionModel)):
        c = model.config
        text = np.zeros((1, c.text_len), np.int32)
        tm = np.zeros((1, c.text_len), np.float32)
        n = min(len(phn_ids), c.text_len)
        text[0, :n] = phn_ids[:n]
        tm[0, :n] = 1
        pr = np.zeros((1, c.prom_len, 8), np.int32)
        pm = np.zeros((1, c.prom_len), np.float32)
        np_ = min(len(proms), c.prom_len)
        pr[0, :np_] = proms[:np_]
        pm[0, :np_] = 1
        kw = {}
        gen_fn = model.generate
        if isinstance(model, DiffusionModel):
            # D3PM-only knobs: skip-step stride and the tight generation
            # bucket (bit-identical valid tokens, less O(T^2) work).
            bucket = c.serving_resp_bucket
            if getattr(args, "decode", "maskgit") == "maskgit":
                # Confidence-ordered parallel decoding: K denoiser
                # evaluations total (vs 99 ancestral) — see
                # DiffusionModel.generate_maskgit.  K clamps to the
                # generation window (each step must commit ≥1 token).
                gen_fn = model.generate_maskgit
                kw = dict(
                    steps=max(1, min(args.maskgit_steps, c.gen_len)),
                    resp_bucket=bucket,
                )
            else:
                kw = dict(stride=max(1, args.stride), resp_bucket=bucket)
        out = gen_fn(
            params, jnp.asarray(text), jnp.asarray(tm), jnp.asarray(pr),
            jnp.asarray(pm), rng, **kw,
        )
        # first gen_len positions are the generated utterance; the rest are
        # padding (0 is a *valid* codec token, so slice — don't filter).
        return np.asarray(out[0, : c.gen_len])

    # AR path
    Tt, Tp = len(phn_ids), len(proms)
    text = np.asarray(phn_ids, np.int32)[None]
    tm = np.ones((1, Tt), np.float32)
    pr = np.asarray(proms, np.int32)[None]
    pm = np.ones((1, Tp), np.float32)
    if getattr(args, "draft_ckpt", None):
        # Speculative decoding: the draft proposes --spec-k tokens per
        # round, the target verifies them in one cached forward.  At
        # --temperature 0 the output is token-identical to the target's
        # own greedy decode (models/ar.py ar_generate_speculative).
        from .export import load_bundle
        from .models.ar import ar_generate_speculative
        from .utils.precision import cast_params_bf16

        d_params, d_meta, _, _ = load_bundle(args.draft_ckpt)
        draft = build_model(d_meta)
        if not isinstance(draft, type(model)):
            raise SystemExit("--draft-ckpt must be an AR bundle")
        if draft.n_tokens != model.n_tokens:
            raise SystemExit(
                f"--draft-ckpt vocab ({draft.n_tokens}) must match the "
                f"target's ({model.n_tokens})"
            )
        if not args.fp32:
            d_params = cast_params_bf16(d_params)
        tokens, lengths = ar_generate_speculative(
            model, params, draft, d_params,
            jnp.asarray(text), jnp.asarray(tm), jnp.asarray(pr),
            jnp.asarray(pm), rng, max_steps=args.max_ar_steps,
            k=max(1, args.spec_k), sampling_temperature=args.temperature,
        )
        return np.asarray(tokens[0, : int(lengths[0])])
    tokens, lengths = ar_generate(
        model, params, jnp.asarray(text), jnp.asarray(tm), jnp.asarray(pr),
        jnp.asarray(pm), rng, max_steps=args.max_ar_steps,
        sampling_temperature=args.temperature,
    )
    return np.asarray(tokens[0, : int(lengths[0])])


def build_model(meta):
    """Rebuild the exported architecture.  ``model.json`` may carry explicit
    dims (d_model/n_heads/n_layers) overriding the registry defaults."""
    from .models import AR, NAR, get_model
    from .models.diffusion import DiffusionConfig, DiffusionModel

    name = meta["model"].lower()
    num_tokens = meta.get("num_tokens", 1024)
    dims = {k: meta[k] for k in ("d_model", "n_heads", "n_layers") if k in meta}
    if name.startswith("diffusion-gaussian"):
        # Continuous-DDPM family: rebuild through the registry so the
        # name-encoded domain/denoiser choices apply, with any exported
        # architecture overrides on top (JSON lists → tuples for the
        # dataclass fields).
        ov = {
            k: tuple(meta[k]) if isinstance(meta[k], list) else meta[k]
            for k in (
                "d_model", "n_heads", "n_layers", "timesteps", "schedule",
                "domain", "resp_len", "text_len", "prom_len", "gen_len",
                "unet_dims", "denoiser", "unet_channels",
            )
            if k in meta
        }
        return get_model(name, num_tokens, ov or None)
    if not dims:
        return get_model(name, num_tokens)
    if name.startswith("diffusion"):
        cfg_kw = {k: meta[k] for k in (
            "d_model", "n_heads", "n_layers", "timesteps", "resp_len",
            "text_len", "prom_len", "gen_len",
            "tower_ffn_dim", "tower_act", "resp_pe",  # imported ref ckpts
        ) if k in meta}
        return DiffusionModel(DiffusionConfig(n_classes=num_tokens + 1, **cfg_kw))
    cls = AR if name.startswith("ar") else NAR
    return cls(num_tokens, **dims)


def main():
    parser = argparse.ArgumentParser("VALL-E TTS (TPU)")
    parser.add_argument("text")
    parser.add_argument("reference", type=Path)
    parser.add_argument("out_path", type=Path)
    parser.add_argument("--ar-ckpt", type=Path, default=Path("zoo/ar"))
    parser.add_argument("--nar-ckpt", type=Path, default=Path("zoo/nar"))
    parser.add_argument("--device", default=None, help="unused on TPU (kept for CLI parity)")
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--nar-temperature", type=float, default=0.2)
    parser.add_argument("--max-ar-steps", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--fp32", action="store_true",
        help="keep fp32 weights (default: bf16 serving precision)",
    )
    parser.add_argument(
        "--stride", type=int, default=1,
        help="diffusion skip-step sampling stride (3 ≈ 3× faster first "
             "stage with a slight quality trade; diffusion bundles only)",
    )
    parser.add_argument(
        "--decode", choices=("ancestral", "maskgit"), default=None,
        help="D3PM sampler (D3PM bundles only).  Default maskgit: "
             "confidence-ordered parallel decoding in --maskgit-steps "
             "denoiser evaluations — it beats the 99-step ancestral chain "
             "on BOTH held-out full-stack accuracy (0.0379 vs 0.0357, "
             "benchmarks/gen_r4/heldout_fullstack_v2_maskgit.json) and "
             "p50 latency (31.6 vs 63 ms, BENCH_r04.json).  "
             "--decode ancestral keeps the reference-parity sampler "
             "(ar_discrete.py:750-780)",
    )
    parser.add_argument(
        "--maskgit-steps", type=int, default=12,
        help="denoiser evaluations for --decode maskgit",
    )
    parser.add_argument(
        "--segment-phones", type=int, default=None,
        help="force long-form synthesis with this per-segment phone budget "
             "(long-form engages automatically when the text exceeds a "
             "diffusion first stage's text bucket)",
    )
    parser.add_argument(
        "--draft-ckpt", type=Path, default=None,
        help="AR bundle used as the speculative-decoding draft: it "
             "proposes --spec-k tokens per round, the target verifies "
             "them in one forward.  At --temperature 0 the output is "
             "token-identical to the target's own greedy decode "
             "(AR first stages only)",
    )
    parser.add_argument(
        "--spec-k", type=int, default=4,
        help="draft proposals per speculative round (--draft-ckpt)",
    )
    args = parser.parse_args()
    if args.decode is None:
        # An explicit --stride asks for the ancestral skip-step sampler;
        # otherwise the measured serving default is maskgit (see --decode
        # help).  Passing --decode always wins.
        args.decode = "ancestral" if args.stride > 1 else "maskgit"

    from .emb import g2p, qnt
    from .export import load_bundle
    from .models.nar import nar_generate
    from .text.symmap import phones_to_ids

    ar_params, ar_meta, phone_symmap, _ = load_bundle(args.ar_ckpt)
    nar_params, nar_meta, _, _ = load_bundle(args.nar_ckpt)
    ar = build_model(ar_meta)
    nar = build_model(nar_meta)

    phones = g2p.encode(args.text)
    phn_ids = phones_to_ids(phones, phone_symmap, strict=False)
    if not phn_ids:
        raise SystemExit("No phones of the input text exist in the model's symmap.")

    from .models.diffusion import DiffusionModel
    from .models.gaussian_tts import GaussianDiffusionModel

    # Long-form capacity: a diffusion first stage (D3PM *or* Gaussian) has
    # a hard text bucket; the AR stage is ragged but trained at ≤
    # max_phones (50 — the serving Synthesizer's text bucket), so all
    # families chain segments past it instead of degrading/truncating
    # (ADVICE r2: previously AR-bundle CLI runs never engaged long-form;
    # r3 review: Gaussian bundles fell through to the AR bucket and could
    # silently truncate to their own smaller text_len).
    first_capacity = (
        ar.config.text_len
        if isinstance(ar, (DiffusionModel, GaussianDiffusionModel))
        else AR_TEXT_BUCKET
    )
    if args.segment_phones is not None or (
        first_capacity is not None and len(phn_ids) > first_capacity
    ):
        # Long-form: chained fixed-bucket segments, one seamless decode.
        # (Branches before the bf16 cast / prompt encode; the Synthesizer
        # re-reads the bundles from disk — acceptable for a one-shot CLI.)
        from .audio.wavio import write_wav
        from .longform import synthesize_long
        from .serve import Synthesizer

        synth = Synthesizer(
            args.ar_ckpt, args.nar_ckpt,
            max_ar_steps=args.max_ar_steps,
            temperature=args.temperature,
            nar_temperature=args.nar_temperature,
            bf16=not args.fp32,
            stride=args.stride,
            decode=args.decode,
            maskgit_steps=args.maskgit_steps,
            draft_ckpt=args.draft_ckpt,
            spec_k=args.spec_k,
        )
        wav, sr = synthesize_long(
            synth, args.text, args.reference, seed=args.seed,
            max_segment_phones=args.segment_phones, phones=phones,
        )
        write_wav(args.out_path, wav, sr)
        print(args.out_path, "saved.")
        return

    if not args.fp32:
        from .utils.precision import cast_params_bf16

        ar_params = cast_params_bf16(ar_params)
        nar_params = cast_params_bf16(nar_params)

    proms = qnt.encode_from_file(args.reference)  # (8, t)
    proms = proms.T  # (t, 8)

    rng = jax.random.PRNGKey(args.seed)
    rng, r1, r2 = jax.random.split(rng, 3)

    resp = first_stage_generate(ar_meta, ar, ar_params, phn_ids, proms, r1, args)

    Tr = len(resp)
    text = np.asarray(phn_ids, np.int32)[None]
    tm = np.ones((1, len(phn_ids)), np.float32)
    pr = np.asarray(proms, np.int32)[None]
    pm = np.ones((1, len(proms)), np.float32)
    rm = np.ones((1, Tr), np.float32)
    resps = nar_generate(
        nar, nar_params, jnp.asarray(text), jnp.asarray(tm), jnp.asarray(pr),
        jnp.asarray(pm), jnp.asarray(resp, jnp.int32)[None], jnp.asarray(rm),
        r2, sampling_temperature=args.nar_temperature,
    )

    qnt.decode_to_file(np.asarray(resps[0]), args.out_path)
    print(args.out_path, "saved.")


if __name__ == "__main__":
    main()
    # final statement: dodge the axon-tunnel teardown wedge
    # (utils/helpers.hard_exit_if_tunnel docstring); no-op off-tunnel
    from tts_with_diffusion_model_tpu.utils.helpers import (  # noqa: E402
        hard_exit_if_tunnel,
    )

    hard_exit_if_tunnel()
