"""Pipelined throughput: ancestral vs maskgit, B=1 and B=8 (one sync per N
launches — removes the tunnel round-trip floor from the comparison)."""
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
bucket = c.serving_resp_bucket


def run(B, label, fn_builder, N=16):
    text = jnp.zeros((B, c.text_len), jnp.int32).at[:, :20].set(5)
    tm = jnp.broadcast_to(
        (jnp.arange(c.text_len)[None] < 20).astype(jnp.float32),
        (B, c.text_len))
    proms = jnp.zeros((B, c.prom_len, c.n_prom_levels), jnp.int32)
    pm = jnp.broadcast_to(
        (jnp.arange(c.prom_len)[None] < 225).astype(jnp.float32),
        (B, c.prom_len))
    fn = fn_builder(text, tm, proms, pm)
    fn(params, jax.random.PRNGKey(0)).block_until_ready()  # compile
    t0 = time.perf_counter()
    outs = [fn(params, jax.random.PRNGKey(300 + i)) for i in range(N)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / N
    print(json.dumps({
        "label": label, "B": B,
        "utt_ms": round(dt * 1e3 / B, 2),
        "tok_per_sec_chip": round(B * c.gen_len / dt, 1),
        "weights": src,
    }), flush=True)


anc = lambda t, m1, p2, m2: jax.jit(lambda p, r: model.generate(
    p, t, m1, p2, m2, r, resp_bucket=bucket))
mg12 = lambda t, m1, p2, m2: jax.jit(lambda p, r: model.generate_maskgit(
    p, t, m1, p2, m2, r, steps=12, resp_bucket=bucket))

run(1, "ancestral_99", anc)
run(1, "maskgit_12", mg12)
run(8, "ancestral_99", anc)
run(8, "maskgit_12", mg12)
