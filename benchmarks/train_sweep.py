"""Training-throughput batch sweep for the production D3PM (single chip).

The reference's second headline is *training time* (``README.md:27-30``:
500 h AR → 280 h D3PM, hardware unspecified).  On this side that headline
reduces to utterances/sec/chip at the production model size, so this sweep
finds the throughput-optimal global batch and reports MFU alongside it —
"fast" judged against the chip, not only against the reference's number.

For each B it runs the real ``Engine.train_batch`` step (sampled-t loss,
bf16 compute, donated buffers) and reports:

  steps/s · utts/s ·  MFU  (XLA cost_analysis FLOPs of the compiled step
                            over measured wall time / chip peak)

Usage:  python benchmarks/train_sweep.py [--batches 24,48,96,192] [--runs 10]

Axon-tunnel gotchas handled: per-step distinct PRNG keys (identical-arg
executions are elided by the tunnel cache) and params passed positionally
(closed-over arrays can blow the HTTP request limit).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))  # v5e bf16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="24,48,96,192")
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--remat", action="store_true",
                    help="per-block gradient checkpointing (the training "
                         "default; lifts the batch ceiling)")
    ap.add_argument("--remat-policy", default=None,
                    help="remat granularity: 'dots' saves matmul outputs "
                         "and recomputes only between them "
                         "(models/base.py resolve_remat_policy)")
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
    rng = jax.random.PRNGKey(0)
    d_params = dm.init(rng)

    opt_cfg = {
        "scheduler": {"warmup_min_lr": 1e-9, "warmup_max_lr": 1e-5,
                      "warmup_num_steps": 100, "total_num_steps": 100000},
        "gradient_clipping": 1.0,
        "gradient_accumulation_steps": 1,
    }

    rng_np = np.random.default_rng(0)
    rows = []
    for B in [int(b) for b in args.batches.split(",")]:
        tbatch = dict(
            text=rng_np.integers(1, 200, (B, c.text_len)).astype(np.int32),
            text_mask=np.ones((B, c.text_len), np.float32),
            proms=rng_np.integers(0, 1024, (B, c.prom_len, 8)).astype(np.int32),
            prom_mask=np.ones((B, c.prom_len), np.float32),
            resp=rng_np.integers(0, 1024, (B, c.resp_len)).astype(np.int32),
            resp_mask=np.ones((B, c.resp_len), np.float32),
        )
        eng = Engine("model", d_params, lambda p, b, r: dm.loss(p, b, r),
                     opt_cfg, f"/tmp/bench_ckpt_sweep_{B}")
        try:
            # FLOPs of the compiled step (params+opt donated, so lower the
            # traced fn manually on the same abstract inputs).
            flops = None
            try:
                import jax.numpy as jnp

                lowered = eng._train_step.lower(
                    eng.params, eng.opt_state,
                    {k: jnp.asarray(v) for k, v in tbatch.items()},
                    jax.random.PRNGKey(0),
                )
                cost = lowered.compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                flops = float(cost.get("flops", 0.0)) or None
            except Exception:
                flops = None

            # Warmup ×2 (layout recompile on step 2 — Engine docstring).
            eng.train_batch(tbatch, jax.random.PRNGKey(10_000))
            eng.train_batch(tbatch, jax.random.PRNGKey(10_001))
            t0 = time.perf_counter()
            for i in range(args.runs):
                eng.train_batch(tbatch, jax.random.PRNGKey(i))
            dt = (time.perf_counter() - t0) / args.runs

            row = {
                "batch": B,
                "step_ms": round(dt * 1e3, 1),
                "steps_per_sec": round(1.0 / dt, 3),
                "utts_per_sec": round(B / dt, 1),
            }
            if flops:
                row["step_tflop"] = round(flops / 1e12, 3)
                row["mfu"] = round(flops / dt / PEAK_FLOPS, 4)
            rows.append(row)
            print(json.dumps(row), flush=True)
        except Exception as e:  # OOM at large B ends the sweep gracefully
            print(json.dumps({"batch": B, "error": str(e)[:200]}), flush=True)
            break

    best = max((r for r in rows if "utts_per_sec" in r),
               key=lambda r: r["utts_per_sec"], default=None)
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
