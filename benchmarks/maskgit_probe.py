"""TPU probe: ancestral (99-step) vs MaskGIT confidence decoding latency.

Per-call blocking p50 over 12 calls each (vary the key per call — the
tunnel elides identical-arg executions).  Trained bundle + bf16 + tight
bucket, same configuration as bench.py.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, "/root/repo")
from bench import _load_trained_or_random  # noqa: E402

from tts_with_diffusion_model_tpu.models import get_model  # noqa: E402
from tts_with_diffusion_model_tpu.utils.precision import cast_params_bf16  # noqa: E402

model = get_model("diffusion")
c = model.config
params, src = _load_trained_or_random(model, jax.random.PRNGKey(0))
params = cast_params_bf16(params)

B = 1
text = jnp.zeros((B, c.text_len), jnp.int32).at[:, :20].set(5)
tm = (jnp.arange(c.text_len)[None] < 20).astype(jnp.float32)
proms = jnp.zeros((B, c.prom_len, c.n_prom_levels), jnp.int32)
pm = (jnp.arange(c.prom_len)[None] < 225).astype(jnp.float32)
bucket = c.serving_resp_bucket


def timeit(fn, label):
    t0 = time.perf_counter()
    fn(params, jax.random.PRNGKey(0)).block_until_ready()
    compile_s = time.perf_counter() - t0
    lat = []
    for i in range(12):
        t0 = time.perf_counter()
        fn(params, jax.random.PRNGKey(100 + i)).block_until_ready()
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p50 = lat[len(lat) // 2]
    print(json.dumps({
        "label": label, "compile_s": round(compile_s, 1),
        "p50_ms": round(p50 * 1e3, 2),
        "tok_per_sec": round(c.gen_len / p50, 1),
        "p10_ms": round(lat[1] * 1e3, 2), "p90_ms": round(lat[-2] * 1e3, 2),
        "weights": src,
    }), flush=True)


anc = jax.jit(lambda p, r: model.generate(p, text, tm, proms, pm, r,
                                          resp_bucket=bucket))
timeit(anc, "ancestral_99")

for K in (16, 12, 8):
    mg = jax.jit(lambda p, r, K=K: model.generate_maskgit(
        p, text, tm, proms, pm, r, steps=K, resp_bucket=bucket))
    timeit(mg, f"maskgit_{K}")
