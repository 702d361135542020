"""Serving batch-size sweep + HLO capture for the D3PM generation program.

Round-2 shipped a measured collapse at B>=16 (tok/s/chip: B=8 8078 ->
B=16 4515) with only a symptom-level diagnosis.  This tool produces the
evidence needed to root-cause it on the attached chip:

  - per-B wall time over repeated blocking calls (p50 of N);
  - XLA cost analysis (flops / bytes accessed) per compiled program;
  - optionally the optimized HLO per B (``--dump-hlo <dir>``) so the B=8
    and B=16 programs can be diffed instruction-by-instruction;
  - ``--variant`` switches the attention formulation to A/B-test fixes:
      * ``baseline``: the production path (einsum with separate b/h dims)
      * ``chunked``:  run B as sequential chunks of 8 inside one program
        (lax.map over sub-batches) — if 2x(B=8) beats 1x(B=16), the
        regression is in XLA's handling of the bigger shapes, and chunking
        is a legitimate serving fix.

Usage (on the TPU):
    python benchmarks/batch_sweep.py --batches 1,4,8,16,32 --iters 8 \
        [--dump-hlo /tmp/hlo] [--variant baseline|chunked] [--stride 1]

Prints one JSON line per B.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_inputs(c, B):
    text = jnp.zeros((B, c.text_len), jnp.int32).at[:, :20].set(5)
    tm = jnp.broadcast_to(
        (jnp.arange(c.text_len)[None] < 20).astype(jnp.float32),
        (B, c.text_len),
    )
    proms = jnp.zeros((B, c.prom_len, c.n_prom_levels), jnp.int32)
    pm = jnp.broadcast_to(
        (jnp.arange(c.prom_len)[None] < 225).astype(jnp.float32),
        (B, c.prom_len),
    )
    return text, tm, proms, pm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4,8,16,32")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dump-hlo", default=None)
    ap.add_argument("--variant", default="baseline",
                    choices=["baseline", "chunked"])
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--bucket", type=int, default=0,
                    help="generation resp bucket (0 = the model's resp_len; "
                         "serving uses the tight 128-multiple of gen_len)")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from tts_with_diffusion_model_tpu.models import get_model
    from tts_with_diffusion_model_tpu.utils.precision import cast_params_bf16

    model = get_model("diffusion")
    c = model.config
    params = cast_params_bf16(model.init(jax.random.PRNGKey(0)))
    bucket = args.bucket or None

    for B in [int(x) for x in args.batches.split(",")]:
        text, tm, proms, pm = build_inputs(c, B)

        if args.variant == "chunked" and B > args.chunk:
            n_chunks = -(-B // args.chunk)
            Bp = n_chunks * args.chunk

            def gen(p, r, text=text, tm=tm, proms=proms, pm=pm,
                    n_chunks=n_chunks, Bp=Bp):
                pad = Bp - text.shape[0]
                if pad:
                    rep = lambda a: jnp.concatenate([a, a[:pad]], axis=0)
                    text, tm, proms, pm = rep(text), rep(tm), rep(proms), rep(pm)
                ck = lambda a: a.reshape(n_chunks, args.chunk, *a.shape[1:])
                keys = jax.random.split(r, n_chunks)

                def one(xs):
                    t, m1, pr, m2, k = xs
                    return model.generate(p, t, m1, pr, m2, k,
                                          stride=args.stride,
                                          resp_bucket=bucket)

                out = jax.lax.map(
                    one, (ck(text), ck(tm), ck(proms), ck(pm), keys)
                )
                return out.reshape(Bp, -1)[: text.shape[0]]

            gen = jax.jit(gen)
        else:
            gen = jax.jit(
                lambda p, r, text=text, tm=tm, proms=proms, pm=pm:
                model.generate(p, text, tm, proms, pm, r,
                               stride=args.stride, resp_bucket=bucket)
            )

        lowered = gen.lower(params, jax.random.PRNGKey(0))
        compiled = lowered.compile()
        if args.dump_hlo:
            os.makedirs(args.dump_hlo, exist_ok=True)
            path = os.path.join(
                args.dump_hlo, f"gen_B{B}_{args.variant}.hlo.txt"
            )
            with open(path, "w") as f:
                f.write(compiled.as_text())

        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]

        gen(params, jax.random.PRNGKey(1)).block_until_ready()  # warm 2nd
        lat = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            gen(params, jax.random.PRNGKey(100 + i)).block_until_ready()
            lat.append(time.perf_counter() - t0)
        lat.sort()
        p50 = lat[len(lat) // 2]
        print(json.dumps({
            "B": B,
            "variant": args.variant,
            "p50_ms": round(p50 * 1e3, 2),
            "tok_per_sec_chip": round(B * c.gen_len / p50, 1),
            "ms_min": round(lat[0] * 1e3, 2),
            "ms_max": round(lat[-1] * 1e3, 2),
            "flops": cost.get("flops") if cost else None,
            "bytes_accessed": cost.get("bytes accessed") if cost else None,
        }), flush=True)


if __name__ == "__main__":
    main()
