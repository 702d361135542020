"""Full-pipeline and per-stage benchmarks on the attached TPU chip.

Measures every headline from BASELINE.md:
  - D3PM first-stage generation rate (codec tokens/sec)  [ref: 211.90]
  - AR first-stage generation rate with the KV-cache decoder  [ref: 120.27]
  - end-to-end text→wav latency p50 (diffusion → NAR levels 2-8 →
    EnCodec decode)  [targets: <1 s on one v5e chip]

Usage: python benchmarks/full_pipeline.py [--runs 5]
Prints one JSON line per metric (bench.py remains the driver's single-line
entry point).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, runs: int, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return out, sorted(ts)[len(ts) // 2]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--runs", type=int, default=5)
    parser.add_argument(
        "--stages", default="d3pm,ar,nar,codec,e2e,e2e_fused",
        help="comma-separated subset: d3pm,ar,nar,codec,e2e,e2e_fused,train",
    )
    parser.add_argument(
        "--bf16", action="store_true",
        help="cast model params to bf16 for inference (serving precision)",
    )
    parser.add_argument(
        "--stride", type=int, default=1,
        help="D3PM sampler stride (skip-step sampling)",
    )
    parser.add_argument(
        "--batch-sizes", default="8",
        help="comma-separated device batch sizes for the d3pm_batch stage",
    )
    parser.add_argument(
        "--bundle", type=Path, default=None,
        help="trained D3PM export bundle for the first stage "
             "(e.g. zoo/diffusion); random init otherwise",
    )
    parser.add_argument(
        "--nar-bundle", type=Path, default=None,
        help="trained NAR export bundle (e.g. zoo/nar); the NAR model is "
             "built from the bundle's architecture instead of nar-half",
    )
    parser.add_argument(
        "--ar-bundle", type=Path, default=None,
        help="trained AR export bundle for the ar stage",
    )
    args = parser.parse_args()
    stages = set(args.stages.split(","))

    try:  # persistent compile cache: repeat runs skip the slow first compile
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from tts_with_diffusion_model_tpu.codec.encodec import HOP, Codec
    from tts_with_diffusion_model_tpu.models import NAR, get_model
    from tts_with_diffusion_model_tpu.models.ar import ar_generate
    from tts_with_diffusion_model_tpu.models.nar import nar_generate

    rng = jax.random.PRNGKey(0)
    results = {}
    weights = {}  # stage -> "trained" | "random" (disclosed per metric)

    def from_bundle(path):
        """(model, params) from an export bundle's own architecture."""
        from tts_with_diffusion_model_tpu.__main__ import build_model
        from tts_with_diffusion_model_tpu.export import load_bundle

        params, meta, _, _ = load_bundle(path)
        return build_model(meta), params

    # shared prompt/text fixtures
    Tt, Tp, Tr = 20, 225, 350
    a_text = jnp.full((1, Tt), 5, jnp.int32)
    a_tm = jnp.ones((1, Tt), jnp.float32)
    a_pr = jnp.zeros((1, Tp, 8), jnp.int32)
    a_pm = jnp.ones((1, Tp), jnp.float32)

    dm = d_params = None
    if {"d3pm", "d3pm_batch", "e2e", "e2e_fused"} & stages:
        if args.bundle:
            dm, d_params = from_bundle(args.bundle)
            weights["d3pm"] = weights["e2e"] = "trained"
        else:
            dm = get_model("diffusion")
            d_params = dm.init(rng)
            weights["d3pm"] = weights["e2e"] = "random"
        c = dm.config
        # a bundle exported with a smaller generation window caps the
        # response span (else the [:, :Tr] clamp under-fills the NAR mask)
        Tr = min(Tr, c.gen_len)
        if args.bf16:
            from tts_with_diffusion_model_tpu.utils.precision import (
                cast_params_bf16,
            )

            d_params = cast_params_bf16(d_params)
        text = jnp.zeros((1, c.text_len), jnp.int32).at[:, :Tt].set(5)
        tm = (jnp.arange(c.text_len)[None] < Tt).astype(jnp.float32)
        proms = jnp.zeros((1, c.prom_len, 8), jnp.int32)
        pm = (jnp.arange(c.prom_len)[None] < Tp).astype(jnp.float32)

    if "d3pm" in stages:
        gen = jax.jit(
            lambda p, r: dm.generate(p, text, tm, proms, pm, r,
                                     stride=args.stride)
        )
        d_tokens, dt = timed(gen, args.runs, d_params, rng)
        key = "d3pm_tokens_per_sec" if args.stride == 1 else (
            f"d3pm_stride{args.stride}_tokens_per_sec"
        )
        results[key] = c.gen_len / dt
        results["d3pm_stage_ms"] = dt * 1e3

    if "d3pm_batch" in stages:
        # serving throughput: Bb utterances sampled concurrently per chip,
        # measured pipelined (single sync — the serving execution model).
        for Bb in [int(b) for b in args.batch_sizes.split(",")]:
            bt = jnp.broadcast_to(text, (Bb, c.text_len))
            btm = jnp.broadcast_to(tm, (Bb, c.text_len))
            bp = jnp.broadcast_to(proms, (Bb, c.prom_len, 8))
            bpm = jnp.broadcast_to(pm, (Bb, c.prom_len))
            genb = jax.jit(lambda p, r: dm.generate(p, bt, btm, bp, bpm, r))
            out = genb(d_params, rng)
            jax.block_until_ready(out)
            N = max(args.runs, 5)
            t0 = time.perf_counter()
            outs = [genb(d_params, jax.random.PRNGKey(i)) for i in range(N)]
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / N
            results[f"d3pm_batch{Bb}_tokens_per_sec"] = Bb * c.gen_len / dt
            results[f"d3pm_batch{Bb}_ms"] = dt * 1e3

    if "ar" in stages:
        # ---------- AR stage (KV-cache decoder) ----------
        steps = Tr
        if args.ar_bundle:
            ar, a_params = from_bundle(args.ar_bundle)
            weights["ar"] = "trained"
        else:
            ar = get_model("ar")  # full-size 1024/16/12 (registry default)
            a_params = ar.init(
                rng, a_text, a_tm, a_pr, a_pm, jnp.zeros((1, 4), jnp.int32),
                jnp.ones((1, 4), jnp.float32),
            )
            weights["ar"] = "random"
        if args.bf16:
            from tts_with_diffusion_model_tpu.utils.precision import (
                cast_params_bf16,
            )

            a_params = cast_params_bf16(a_params)
        ar_fn = jax.jit(
            lambda p, r: ar_generate(
                ar, p, a_text, a_tm, a_pr, a_pm, r, max_steps=steps
            )[0]
        )
        _, dt = timed(ar_fn, args.runs, a_params, rng)
        results["ar_tokens_per_sec"] = steps / dt
        results["ar_stage_ms"] = dt * 1e3

    nar = n_params = None
    n_rm = jnp.ones((1, Tr), jnp.float32)
    if {"nar", "e2e", "e2e_fused"} & stages:
        if args.nar_bundle:
            nar, n_params = from_bundle(args.nar_bundle)
            weights["nar"] = "trained"
        else:
            nar = get_model("nar-half")
            n_resps = jnp.zeros((1, Tr, 8), jnp.int32)
            n_params = nar.init(
                rng, a_text, a_tm, a_pr, a_pm, n_resps, n_rm,
                jnp.zeros((1,), jnp.int32),
            )
            weights["nar"] = "random"
        if weights.get("e2e") == "trained" and weights["nar"] != "trained":
            weights["e2e"] = "random"

    codes = jnp.zeros((1, Tr, 8), jnp.int32)
    if "nar" in stages:
        lvl0 = jax.random.randint(rng, (1, Tr), 0, 1024)

        def nar_fn(p, r):
            return nar_generate(nar, p, a_text, a_tm, a_pr, a_pm, lvl0, n_rm, r)

        codes, dt = timed(nar_fn, args.runs, n_params, rng)
        results["nar_stage_ms"] = dt * 1e3

    if "train" in stages:
        # D3PM training step throughput at production size (sampled-t mode,
        # B=24 ≈ the reference's LibriTTS batch) — the "training time"
        # headline (ref: 280 h) reduces to steps/sec × total steps.
        from tts_with_diffusion_model_tpu.train.engine import Engine

        if dm is None:
            if args.bundle:
                dm, d_params = from_bundle(args.bundle)
                weights["d3pm"] = "trained"
            else:
                dm = get_model("diffusion")
                d_params = dm.init(rng)
                weights["d3pm"] = "random"
            c = dm.config
        B = 24
        rng_np = np.random.default_rng(0)
        tbatch = dict(
            text=rng_np.integers(1, 200, (B, c.text_len)).astype(np.int32),
            text_mask=np.ones((B, c.text_len), np.float32),
            proms=rng_np.integers(0, 1024, (B, c.prom_len, 8)).astype(np.int32),
            prom_mask=np.ones((B, c.prom_len), np.float32),
            resp=rng_np.integers(0, 1024, (B, c.resp_len)).astype(np.int32),
            resp_mask=np.ones((B, c.resp_len), np.float32),
        )
        opt_cfg = {
            "scheduler": {"warmup_min_lr": 1e-9, "warmup_max_lr": 1e-5,
                          "warmup_num_steps": 100, "total_num_steps": 100000},
            "gradient_clipping": 1.0,
            "gradient_accumulation_steps": 1,
        }
        eng = Engine("model", d_params, lambda p, b, r: dm.loss(p, b, r),
                     opt_cfg, "/tmp/bench_ckpt")
        # Two warmup steps: the first compiles with default input layouts,
        # the second recompiles once against XLA's preferred output layouts
        # (steady state from step 3).
        eng.train_batch(tbatch, rng)
        eng.train_batch(tbatch, rng)
        t0 = time.perf_counter()
        n = max(args.runs, 3)
        for i in range(n):
            eng.train_batch(tbatch, jax.random.PRNGKey(i))
        dt = (time.perf_counter() - t0) / n
        results["d3pm_train_steps_per_sec"] = 1.0 / dt
        results["d3pm_train_utts_per_sec"] = B / dt

    codec = None
    if {"codec", "e2e", "e2e_fused"} & stages:
        codec = Codec()
    audio_sec = Tr * HOP / 24_000

    if "codec" in stages:
        dec = jax.jit(
            lambda p, cc: codec.model.apply(p, cc, method=type(codec.model).decode)
        )
        codes_bqt = jnp.moveaxis(codes, 2, 1)  # (1, 8, Tr)
        wav, dt = timed(dec, args.runs, codec.params, codes_bqt)
        results["codec_decode_ms"] = dt * 1e3
        results["decode_rtf"] = audio_sec / dt  # real-time factor (>1 = faster)

    if "e2e" in stages:
        # Chained separately-compiled stages — the serving execution model
        # (one program per stage; tokens round-trip as tiny arrays).
        d_gen = jax.jit(lambda p, r: dm.generate(p, text, tm, proms, pm, r))
        c_dec = jax.jit(
            lambda p, cc: codec.model.apply(p, cc, method=type(codec.model).decode)
        )

        def full(r):
            r1, r2 = jax.random.split(r)
            toks = d_gen(d_params, r1)[:, :Tr]
            cc = nar_generate(nar, n_params, a_text, a_tm, a_pr, a_pm,
                              jnp.asarray(toks, jnp.int32), n_rm, r2)
            return c_dec(codec.params, jnp.moveaxis(cc, 2, 1))

        wav, dt = timed(full, args.runs, rng)
        results["e2e_text_to_wav_p50_ms"] = dt * 1e3
        results["e2e_audio_seconds"] = audio_sec

    if "e2e_fused" in stages:
        # The serving runtime's one-dispatch program (serve.Synthesizer
        # _fused_synth): diffusion first stage → 7 NAR levels → codec
        # decode compiled as ONE XLA program, one host sync per call.
        def fused(p_d, p_n, p_c, r):
            r1, r2 = jax.random.split(r)
            toks = dm.generate(p_d, text, tm, proms, pm, r1)[:, :Tr]
            cc = nar_generate(nar, p_n, a_text, a_tm, a_pr, a_pm,
                              jnp.asarray(toks, jnp.int32), n_rm, r2)
            wav = codec.model.apply(p_c, jnp.moveaxis(cc, 2, 1),
                                    method=type(codec.model).decode)
            return wav[:, : Tr * HOP, 0]

        fused_j = jax.jit(fused)
        wav, dt = timed(fused_j, args.runs, d_params, n_params,
                        codec.params, rng)
        results["e2e_fused_text_to_wav_p50_ms"] = dt * 1e3
        results["e2e_audio_seconds"] = audio_sec

    baselines = {
        "d3pm_tokens_per_sec": 211.90,
        "ar_tokens_per_sec": 120.27,
    }
    for k, v in results.items():
        line = {"metric": k, "value": round(float(v), 2)}
        if k in baselines:
            line["vs_baseline"] = round(float(v) / baselines[k], 3)
        for stage, tag in weights.items():
            if k.startswith(stage):
                line["weights"] = tag
        print(json.dumps(line))


if __name__ == "__main__":
    main()
    # dodge the axon-tunnel teardown wedge (utils/helpers.py)
    from tts_with_diffusion_model_tpu.utils.helpers import (  # noqa: E402
        hard_exit_if_tunnel,
    )

    hard_exit_if_tunnel()
