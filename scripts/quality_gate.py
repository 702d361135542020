"""Quality gate: synthesized level-0 tokens must match a training utterance.

Used by ``scripts/e2e_demo.sh`` after training + exporting the diffusion
model on the toy corpus: the overfit model, asked for a training
utterance's text with that utterance as the speaker prompt, must reproduce
its level-0 codec tokens (≥ --min-acc, default 0.7) — the through-the-real-
entrypoints analogue of ``tests/test_d3pm.py``'s overfit-and-recover check
and of the reference's one-sample overfit convention
(``/root/reference/vall_e/vall_e/nar.py:149-165``).  Exits nonzero on
regression so the demo fails loudly.

    python scripts/quality_gate.py <bundle-dir> <train.wav> '<text>' \
        [--prompt-wav <other.wav>] [--min-acc 0.7] [--seed 0]

``--prompt-wav`` (default: the target wav) must match the TRAINING prompt
convention: prompts are sampled from *other* utterances of the speaker
(``/root/reference/vall_e/data.py:136-155`` — the current utterance is
excluded), so on a tiny overfit corpus a production-size model memorizes
the exact (text, prompt) pairing and prompting with the target utterance
itself is out-of-distribution (measured: 1.000 vs 0.200 level-0 accuracy
on the 2-utterance soak corpus — per-t x0 accuracy is 1.0 at every
timestep with the training-style prompt).  Pass the *other* utterance here.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bundle", type=Path)
    ap.add_argument("wav", type=Path)
    ap.add_argument("text")
    ap.add_argument("--prompt-wav", type=Path, default=None)
    ap.add_argument("--min-acc", type=float, default=0.7)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--decode", choices=("ancestral", "maskgit"),
                    default="ancestral",
                    help="first-stage sampler (maskgit = confidence-ordered "
                         "parallel decoding, D3PM bundles only)")
    ap.add_argument("--maskgit-steps", type=int, default=12)
    ap.add_argument(
        "--nar-bundle", type=Path, default=None,
        help="trained NAR bundle: extend the gate through all 8 RVQ levels "
             "(levels 1-7 filled by the NAR), decode the full code stack to "
             "a wav, and report per-level token accuracy + DTW-MCD against "
             "the ground-truth wav (the full-stack analogue of the "
             "reference's two-stage CLI, ``vall_e/__main__.py:66-73``)",
    )
    ap.add_argument(
        "--max-mcd", type=float, default=None,
        help="with --nar-bundle: fail the gate if the CODEC-CONTROLLED "
             "DTW-MCD (dB; hyp vs the ground-truth codes' round-trip, NOT "
             "vs the raw recording — that is mcd_vs_raw) exceeds this",
    )
    ap.add_argument("--nar-temperature", type=float, default=0.2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tts_with_diffusion_model_tpu.__main__ import build_model
    from tts_with_diffusion_model_tpu.emb import g2p, qnt
    from tts_with_diffusion_model_tpu.export import load_bundle
    from tts_with_diffusion_model_tpu.text.symmap import phones_to_ids

    params, meta, phone_symmap, _ = load_bundle(args.bundle)
    model = build_model(meta)
    c = model.config

    codes = qnt.encode_from_file(args.wav)  # (8, T)
    target = np.asarray(codes[0])
    prom_codes = (
        qnt.encode_from_file(args.prompt_wav) if args.prompt_wav else codes
    )
    proms = np.asarray(prom_codes).T  # (T, 8)

    phn_ids = phones_to_ids(g2p.encode(args.text), phone_symmap, strict=False)

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

    n_cmp = min(len(target), c.gen_len)
    gen_fn, kw = model.generate, {}
    if args.decode == "maskgit":
        gen_fn, kw = model.generate_maskgit, {"steps": args.maskgit_steps}
    out = gen_fn(
        params, jnp.asarray(text), jnp.asarray(tm), jnp.asarray(pr),
        jnp.asarray(pm), jax.random.PRNGKey(args.seed), gen_len=n_cmp, **kw,
    )
    hyp = np.asarray(out[0, :n_cmp])
    acc = float((hyp == target[:n_cmp]).mean())

    report = {
        "tokens_compared": int(n_cmp),
        "level0_token_accuracy": round(acc, 4),
        "min_acc": args.min_acc,
        "decode": args.decode,
        "ok": acc >= args.min_acc,
    }

    if args.nar_bundle is not None:
        # Full-stack leg: NAR fills levels 1-7 on top of the first stage's
        # level 0, the whole 8-level stack decodes to a wav, and the wav is
        # scored against the ground-truth recording (DTW-MCD).
        from tts_with_diffusion_model_tpu.audio.wavio import read_wav
        from tts_with_diffusion_model_tpu.models.nar import nar_generate
        from tts_with_diffusion_model_tpu.utils.metrics import (
            eval_utterance_metrics,
        )

        nar_params, nar_meta, _, _ = load_bundle(args.nar_bundle)
        nar = build_model(nar_meta)
        rm = np.ones((1, n_cmp), np.float32)
        resps = nar_generate(
            nar, nar_params, jnp.asarray(text), jnp.asarray(tm),
            jnp.asarray(pr), jnp.asarray(pm), out[:, :n_cmp],
            jnp.asarray(rm), jax.random.PRNGKey(args.seed + 1),
            sampling_temperature=args.nar_temperature,
        )
        hyp_codes = np.asarray(resps[0])             # (n_cmp, 8)
        ref_codes = np.asarray(codes)[:, :n_cmp].T   # (n_cmp, 8)
        hyp_wav, sr = qnt.decode(hyp_codes.T)
        hyp_wav = np.asarray(hyp_wav).reshape(-1)
        ref_wav, ref_sr = read_wav(args.wav)
        ref_wav = np.asarray(ref_wav).reshape(-1)
        # ``mcd`` is codec-controlled: score against the round-trip of the
        # ground-truth codes so both sides share the codec and the number
        # isolates the TTS stack; the raw-recording comparison stays as
        # ``mcd_vs_raw`` beside the codec's own floor (see heldout_eval.py).
        rt_wav, _ = qnt.decode(ref_codes.T)
        rt_wav = np.asarray(rt_wav).reshape(-1)
        m = eval_utterance_metrics(
            hyp_codes, ref_codes, hyp_wav=hyp_wav, ref_wav=rt_wav, sr=sr)
        from tts_with_diffusion_model_tpu.utils.metrics import (
            mel_cepstral_distortion,
        )

        m["mcd_vs_raw"] = mel_cepstral_distortion(
            hyp_wav, ref_wav, sr)["mcd"]
        m["codec_floor_mcd"] = mel_cepstral_distortion(
            rt_wav, ref_wav, sr)["mcd"]
        report["full_stack"] = {
            k: round(float(v), 4) for k, v in m.items()
        }
        if args.max_mcd is not None:
            mcd = m.get("mcd", float("inf"))
            report["max_mcd"] = args.max_mcd
            report["ok"] = bool(report["ok"] and mcd <= args.max_mcd)

    print(json.dumps(report))
    if not report["ok"]:
        print(
            f"QUALITY GATE FAILED: {json.dumps(report)}",
            file=sys.stderr,
        )
        sys.exit(1)
    print("quality gate OK")


if __name__ == "__main__":
    main()
    # dodge the axon-tunnel teardown wedge (utils/helpers.py)
    from tts_with_diffusion_model_tpu.utils.helpers import (  # noqa: E402
        hard_exit_if_tunnel,
    )

    hard_exit_if_tunnel()
