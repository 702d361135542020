#!/usr/bin/env python
"""Measure speculative AR decoding on trained weights (VERDICT r3 item 7).

The correctness contract (temperature-0 output token-identical to the
target's own greedy decode for ANY draft) is pinned in
``tests/test_ar_spec.py``; what was missing is *evidence of value*: an
acceptance rate and a wall-clock speedup measured with a trained
draft+target pair, not random weights.  This script produces that number.

Inputs are two export bundles (``python -m ...export``) trained on the same
corpus — e.g. the round-4 generalization corpus via ``config/gen4/ar.yml``
(target, d1024/16/12) and ``config/gen4/ar_quarter.yml`` (draft,
d256/4/12) — plus the corpus dir; prompts/texts are drawn from *val-split*
utterances (the trainer's real 95/5 seed-0 split) so the measurement is
on-distribution but not memorized.

Reports, per speculative chunk size k:
  - wall-clock p50 per call vs the plain one-dispatch cached decode
    (``ar_generate``) at the same ``max_steps``,
  - accepted-tokens-per-round (= committed / rounds; the plain decode's
    equivalent is 1.0 by construction),
  - greedy token identity with the plain decode (hard assert).

Usage:
  python benchmarks/spec_decode_bench.py TARGET_BUNDLE DRAFT_BUNDLE DATA \
      [--k 2 4 6 8] [--iters 12] [--max-steps 192] [--out out.json]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tts_with_diffusion_model_tpu.__main__ import build_model
from tts_with_diffusion_model_tpu.data.dataset import (
    get_phones,
    load_quants,
    load_train_val_paths,
)
from tts_with_diffusion_model_tpu.export import load_bundle
from tts_with_diffusion_model_tpu.models.ar import (
    ar_generate,
    ar_generate_speculative,
)


def _inputs(data_dirs, phone_symmap, n_prom_frames=60):
    """One val utterance's text + a same-speaker train prompt (B=1)."""
    get_spkr = lambda p: p.parts[-2]
    train_paths, val_paths = load_train_val_paths(
        [Path(d) for d in data_dirs], get_spkr
    )
    vp = val_paths[0]
    spkr = get_spkr(vp)
    prom_path = next(p for p in train_paths if get_spkr(p) == spkr)

    phones = get_phones(vp)
    ids = np.asarray([phone_symmap[p] for p in phones], np.int32)
    proms = load_quants(prom_path)[:n_prom_frames]  # (Tp, 8)

    text = ids[None]
    tm = np.ones_like(text, np.float32)
    pr = proms[None]
    pm = np.ones((1, pr.shape[1]), np.float32)
    return (
        jnp.asarray(text), jnp.asarray(tm),
        jnp.asarray(pr), jnp.asarray(pm),
        str(vp),
    )


def _timed(fn, iters):
    """fn(i) -> out; i makes each call's args distinct (the axon tunnel
    elides identical-argument executions — same gotcha train_sweep.py
    documents — so timing identical calls measures its cache, not the
    decode)."""
    fn(iters)  # compile + warm
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(i)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("target", type=Path)
    ap.add_argument("draft", type=Path)
    ap.add_argument("data", nargs="+")
    ap.add_argument("--k", type=int, nargs="+", default=[2, 4, 6, 8])
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--max-steps", type=int, default=192)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()

    t_params, t_meta, phone_symmap, _ = load_bundle(args.target)
    d_params, d_meta, _, _ = load_bundle(args.draft)
    target = build_model(t_meta)
    draft = build_model(d_meta)
    text, tm, pr, pm, utt = _inputs(args.data, phone_symmap)
    rng = jax.random.PRNGKey(0)
    ms = args.max_steps

    # Timing calls vary the PROMPT content per iteration (jnp.roll by i
    # frames): at temperature 0 the PRNG key is dead code, XLA DCE makes
    # every call's live arguments bit-identical, and the axon tunnel
    # elides re-execution — varying a consumed input is the only way to
    # time the real decode.  Token-identity checks use a separate explicit
    # i=0 call so both paths see the same inputs.
    def roll(i):
        return jnp.roll(pr, i, axis=1)

    plain_ms, _ = _timed(
        lambda i: ar_generate(
            target, t_params, text, tm, roll(i), pm,
            jax.random.fold_in(rng, i),
            max_steps=ms, sampling_temperature=0.0,
        ),
        args.iters,
    )
    ref_toks, ref_len = ar_generate(
        target, t_params, text, tm, pr, pm, rng,
        max_steps=ms, sampling_temperature=0.0,
    )
    n_ref = int(ref_len[0])
    report = {
        "utterance": utt,
        "target": t_meta["model"],
        "draft": d_meta["model"],
        "max_steps": ms,
        "gen_len": n_ref,
        "plain_p50_ms": round(plain_ms, 2),
        "plain_tok_s": round(n_ref / (plain_ms / 1e3), 1),
        "k": {},
    }
    ref = np.asarray(ref_toks[0, :n_ref])

    def tf_margins():
        """Teacher-forced top-2 logit margins along the plain-decode
        sequence (cached after first use).  Used to adjudicate greedy
        divergences: on TPU the default matmul precision accumulates fp32
        operands in bf16 passes, so the chunked verify forward
        (``decode_chunk``) and the stepwise decode differ by ~1e-2 logit
        noise — token identity is exact except where the target's top-2
        margin is below that noise (measured here: a 0.024-margin global
        minimum flipped at position 128 while the median margin was 0.94).
        A divergence at a sub-noise tie is the standard speculative-
        decoding numerics caveat, not an acceptance-rule bug; anything
        above TIE_MARGIN still hard-fails."""
        nonlocal _margins
        if _margins is None:
            import jax.numpy as jnp

            T = n_ref
            resp = jnp.asarray(ref[None], jnp.int32)
            rm = np.ones((1, T), np.float32)
            logits, _ = target.apply(
                t_params, jnp.asarray(text), jnp.asarray(tm),
                jnp.asarray(pr), jnp.asarray(pm), resp, jnp.asarray(rm))
            seg = np.asarray(logits[0], np.float32)[-(T + 1):-1]
            top2 = np.sort(seg, axis=-1)[:, -2:]
            _margins = top2[:, 1] - top2[:, 0]
        return _margins

    _margins = None
    TIE_MARGIN = 0.1  # bf16-pass logit noise bound at trained-logit scale

    for k in args.k:
        spec_ms, _ = _timed(
            lambda i, k=k: ar_generate_speculative(
                target, t_params, draft, d_params, text, tm, roll(i), pm,
                jax.random.fold_in(rng, i),
                max_steps=ms, k=k, sampling_temperature=0.0,
                with_stats=True,
            ),
            args.iters,
        )
        toks, lens, stats = ar_generate_speculative(
            target, t_params, draft, d_params, text, tm, pr, pm, rng,
            max_steps=ms, k=k, sampling_temperature=0.0, with_stats=True,
        )
        n = int(lens[0])
        got = np.asarray(toks[0, :n])
        identical = n == n_ref and bool((got == ref).all())
        first_div = tie_margin = None
        if not identical:
            m = min(n, n_ref)
            div = np.nonzero(got[:m] != ref[:m])[0]
            first_div = int(div[0]) if len(div) else m
            tie_margin = float(tf_margins()[first_div])
            assert tie_margin < TIE_MARGIN, (
                f"k={k}: greedy output diverged from plain decode at "
                f"position {first_div} with target margin {tie_margin:.3f} "
                f">= {TIE_MARGIN} — a real acceptance bug, not a tie"
            )
        rounds = int(stats["rounds"])
        committed = int(stats["committed"][0])
        report["k"][k] = {
            "p50_ms": round(spec_ms, 2),
            "tok_s": round(n / (spec_ms / 1e3), 1),
            "speedup": round(plain_ms / spec_ms, 2),
            "rounds": rounds,
            # cnt includes the prefill token y0, committed before round 1
            "accepted_per_round": round((committed - 1) / max(rounds, 1), 2),
            "acceptance_rate": round(
                # fraction of drafted tokens the target kept (excludes the
                # free corrected/bonus token each round commits)
                max(committed - rounds - 1, 0) / max(rounds * k, 1), 3,
            ),
            "identical": identical,
            "first_divergence": first_div,
            "tie_margin": (round(tie_margin, 4)
                           if tie_margin is not None else None),
        }
        print(json.dumps({"k": k, **report["k"][k]}))

    print(json.dumps(report))
    if args.out:
        args.out.write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
    # dodge the axon-tunnel teardown wedge (utils/helpers.py)
    from tts_with_diffusion_model_tpu.utils.helpers import (  # noqa: E402
        hard_exit_if_tunnel,
    )

    hard_exit_if_tunnel()
