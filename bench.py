"""Benchmark: D3PM first-stage generation throughput (codec tokens/sec).

Measures the headline number from the reference README (``README.md:27-30``):
codec tokens generated per second by the diffusion first stage — 211.90
tok/s for the reference D3PM (BASELINE.md).  Here the full 99-step reverse
process runs as one jit-compiled ``lax.scan`` on device (conditioning towers
hoisted out of the loop), generating 350 level-0 tokens per utterance
(≡ ``ar_discrete.py:699,750``).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_TOK_PER_SEC = 211.90  # reference D3PM (README.md:27-30)


def main():
    try:  # persistent compile cache: repeat runs skip the first-compile cost
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from tts_with_diffusion_model_tpu.models import get_model

    from tts_with_diffusion_model_tpu.utils.precision import cast_params_bf16

    model = get_model("diffusion")
    c = model.config
    rng = jax.random.PRNGKey(0)
    params = cast_params_bf16(model.init(rng))  # serving precision

    B = 1
    text = jnp.zeros((B, c.text_len), jnp.int32).at[:, :20].set(5)
    tm = (jnp.arange(c.text_len)[None] < 20).astype(jnp.float32)
    proms = jnp.zeros((B, c.prom_len, c.n_prom_levels), jnp.int32)
    pm = (jnp.arange(c.prom_len)[None] < 225).astype(jnp.float32)

    gen = jax.jit(
        lambda p, r: model.generate(p, text, tm, proms, pm, r)
    )

    # warmup/compile
    out = gen(params, rng)
    out.block_until_ready()

    # steady-state throughput: launch N generations back-to-back and sync
    # once (per-call sync would charge a host↔device round trip per run,
    # an artifact of the dispatch path, not the device).
    N = 8
    t0 = time.perf_counter()
    outs = [gen(params, jax.random.PRNGKey(i + 1)) for i in range(N)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / N
    tokens_per_sec = c.gen_len / dt

    print(
        json.dumps(
            {
                "metric": "d3pm_generation_tokens_per_sec",
                "value": round(tokens_per_sec, 2),
                "unit": "codec tokens/sec/chip",
                "vs_baseline": round(tokens_per_sec / BASELINE_TOK_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
