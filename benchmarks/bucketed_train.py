"""Quantify length-bucketed training batching on the chip.

The production D3PM trains at a fixed 448-frame response bound
(≡ ``ar_discrete.py:592-626``); real utterances are mostly shorter, so a
fixed bound burns MXU FLOPs on masked positions.  ``LengthBucketedLoader``
(data/dataset.py) regroups batches by valid length and trims to a small
bucket set — this benchmark measures what that buys:

  1. time the real ``Engine.train_batch`` step at each bucket shape,
  2. draw synthetic utterance lengths from a documented LibriTTS-like
     distribution (lognormal, median ~4 s of 75 Hz codes, clipped to the
     model's bound — no real corpus ships in this environment),
  3. simulate the loader's sort-window grouping to get bucket usage,
  4. report expected utts/s with bucketing vs the fixed full bound.

Usage: python benchmarks/bucketed_train.py [--batch 192] [--runs 8]
       [--buckets 192,320,448] [--window 8] [--remat] [--remat-policy dots]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_lengths(rng: np.random.Generator, n: int, bound: int) -> np.ndarray:
    """LibriTTS-like response lengths: lognormal over 75 Hz EnCodec frames,
    median ≈ 300 frames (~4 s), sigma 0.45, clipped to [50, bound]."""
    lens = rng.lognormal(mean=np.log(300.0), sigma=0.45, size=n)
    return np.clip(lens, 50, bound).astype(np.int64)


def simulate_grouping(lens: np.ndarray, B: int, window: int,
                      buckets: list[int]) -> list[int]:
    """Reproduce LengthBucketedLoader's regrouping: windows of W·B samples,
    sort by length, chunk into B-sized groups, pick the smallest covering
    bucket per group.  Returns one bucket choice per emitted batch."""
    per_window = B * window
    out = []
    for s in range(0, len(lens) - per_window + 1, per_window):
        w = np.sort(lens[s:s + per_window])
        for g in range(window):
            need = int(w[(g + 1) * B - 1])  # group max (sorted)
            out.append(next(b for b in buckets if b >= need))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--runs", type=int, default=8)
    ap.add_argument("--buckets", default="192,320,448")
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--samples", type=int, default=30_720)
    ap.add_argument("--remat", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--remat-policy", default=None)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from tts_with_diffusion_model_tpu.models import get_model
    from tts_with_diffusion_model_tpu.train.engine import Engine

    dm = get_model("diffusion", overrides={"remat": args.remat,
                                           "remat_policy": args.remat_policy})
    c = dm.config
    buckets = sorted({int(b) for b in args.buckets.split(",")} | {c.resp_len})
    B = args.batch

    opt_cfg = {
        "scheduler": {"warmup_min_lr": 1e-9, "warmup_max_lr": 1e-5,
                      "warmup_num_steps": 100, "total_num_steps": 100000},
        "gradient_clipping": 1.0,
        "gradient_accumulation_steps": 1,
    }
    eng = Engine("model", dm.init(jax.random.PRNGKey(0)),
                 lambda p, b, r: dm.loss(p, b, r), opt_cfg,
                 "/tmp/bench_ckpt_bucketed")

    rng_np = np.random.default_rng(0)

    def make_batch(R: int) -> dict:
        return dict(
            text=rng_np.integers(1, 200, (B, c.text_len)).astype(np.int32),
            text_mask=np.ones((B, c.text_len), np.float32),
            proms=rng_np.integers(0, 1024, (B, c.prom_len, 8)).astype(np.int32),
            prom_mask=np.ones((B, c.prom_len), np.float32),
            resp=rng_np.integers(0, 1024, (B, R)).astype(np.int32),
            resp_mask=np.ones((B, R), np.float32),
        )

    step_ms = {}
    for R in buckets:
        tb = make_batch(R)
        eng.train_batch(tb, jax.random.PRNGKey(10_000))  # compile
        eng.train_batch(tb, jax.random.PRNGKey(10_001))  # layout recompile
        t0 = time.perf_counter()
        for i in range(args.runs):
            eng.train_batch(tb, jax.random.PRNGKey(i))
        step_ms[R] = (time.perf_counter() - t0) / args.runs * 1e3
        print(json.dumps({"bucket": R, "step_ms": round(step_ms[R], 1),
                          "utts_per_sec": round(B / step_ms[R] * 1e3, 1)}),
              flush=True)

    lens = synth_lengths(np.random.default_rng(1), args.samples, c.resp_len)
    choices = simulate_grouping(lens, B, args.window, buckets)
    counts = {b: choices.count(b) for b in buckets}
    t_bucketed = sum(step_ms[b] for b in choices) / len(choices)
    t_full = step_ms[c.resp_len]
    print(json.dumps({
        "distribution": "lognormal(med=300f, sigma=0.45) clip [50, %d]" % c.resp_len,
        "bucket_usage": counts,
        "step_ms_full": round(t_full, 1),
        "step_ms_bucketed_mean": round(t_bucketed, 1),
        "utts_per_sec_full": round(B / t_full * 1e3, 1),
        "utts_per_sec_bucketed": round(B / t_bucketed * 1e3, 1),
        "speedup": round(t_full / t_bucketed, 3),
    }))


if __name__ == "__main__":
    main()
