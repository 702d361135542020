"""Script-surface smokes for the measurement scripts that run AFTER long
trained-artifact builds (scripts/r4_resume2.sh / r4_post.sh), so a
multi-hour training run cannot be wasted on script rot:

- ``benchmarks/spec_decode_bench.py`` — the speculative-decoding
  *algorithm* is pinned in ``tests/test_ar_spec.py``; this protects the
  measurement script itself (bundle IO, corpus discovery via the real
  95/5 split, stats accounting, JSON report).  Random weights →
  acceptance ≈ 0 is expected; the hard property is greedy token-identity
  with the plain decode, which the script asserts internally for every k.
- ``scripts/heldout_eval.py`` with an AR first stage — the AR branch
  (auto-detected bundle, model-chosen lengths, junk-past-stop zeroing,
  batched codec decode) exercised end-to-end on a tiny corpus.
"""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_with_diffusion_model_tpu.export import save_bundle
from tts_with_diffusion_model_tpu.models import AR

REPO = Path(__file__).resolve().parents[1]


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, REPO / "benchmarks" / f"{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_spec_decode_bench_script(tmp_path, monkeypatch):
    data = tmp_path / "data/spk0"
    data.mkdir(parents=True)
    phones = ["AY1", "M", "HH", "IY1", "R", "T", "UW1", "EY1", "K", "S"]
    symmap = {p: i for i, p in enumerate(["<s>", "</s>", "_"] + phones, 1)}
    rng_np = np.random.default_rng(0)
    # enough utterances that the seed-0 95/5 split yields a val path
    for i in range(24):
        n = int(rng_np.integers(6, 10))
        (data / f"utt{i:03d}.phn.txt").write_text(
            " ".join(rng_np.choice(phones, n))
        )
        t = int(rng_np.integers(30, 70))
        np.save(
            data / f"utt{i:03d}.qnt.npy",
            rng_np.integers(0, 1024, size=(1, 8, t)).astype(np.int64),
        )

    rng = jax.random.PRNGKey(0)
    t = jnp.zeros((1, 4), jnp.int32)
    m1 = jnp.ones((1, 4))
    pr = jnp.zeros((1, 5, 8), jnp.int32)
    pm = jnp.ones((1, 5))
    r = jnp.zeros((1, 5), jnp.int32)
    rm = jnp.ones((1, 5))
    for name, d in [("target", 32), ("draft", 16)]:
        ar = AR(1024, d_model=d, n_heads=4, n_layers=1, remat=False,
                dtype=jnp.float32)
        save_bundle(
            tmp_path / name, ar.init(rng, t, m1, pr, pm, r, rm),
            {"model": "ar", "num_tokens": 1024, "d_model": d, "n_heads": 4,
             "n_layers": 1}, symmap, {"spk0": 0},
        )

    out = tmp_path / "out.json"
    monkeypatch.setattr(sys, "argv", [
        "spec_decode_bench.py", str(tmp_path / "target"),
        str(tmp_path / "draft"), str(tmp_path / "data"),
        "--k", "2", "--iters", "1", "--max-steps", "8", "--out", str(out),
    ])
    _load_script("spec_decode_bench").main()

    report = json.loads(out.read_text())
    assert report["k"]["2"]["identical"] is True
    assert report["plain_p50_ms"] > 0
    assert 0.0 <= report["k"]["2"]["acceptance_rate"] <= 1.0


@pytest.mark.slow
def test_heldout_eval_ar_script(tmp_path, monkeypatch):
    """scripts/heldout_eval.py with an AR first-stage bundle (the exact
    command scripts/r4_post.sh stage 1 runs on the trained gen4b bundles)."""
    from tts_with_diffusion_model_tpu.audio.wavio import write_wav
    from tts_with_diffusion_model_tpu.codec.encodec import HOP
    from tts_with_diffusion_model_tpu.models import NAR

    monkeypatch.delenv("ENCODEC_WEIGHTS", raising=False)
    data = tmp_path / "data/spk0"
    data.mkdir(parents=True)
    phones = ["AY1", "M", "HH", "IY1", "R", "T", "UW1", "EY1", "K", "S"]
    symmap = {p: i for i, p in enumerate(["<s>", "</s>", "_"] + phones, 1)}
    rng_np = np.random.default_rng(0)
    for i in range(24):
        n = int(rng_np.integers(6, 10))
        (data / f"utt{i:03d}.phn.txt").write_text(
            " ".join(rng_np.choice(phones, n))
        )
        t = int(rng_np.integers(20, 40))
        np.save(
            data / f"utt{i:03d}.qnt.npy",
            rng_np.integers(0, 1024, size=(1, 8, t)).astype(np.int64),
        )
        wav = np.sin(np.linspace(0, 440 * np.pi, t * HOP)).astype(np.float32)
        write_wav(data / f"utt{i:03d}.wav", wav, 24_000)

    rng = jax.random.PRNGKey(0)
    text = jnp.zeros((1, 4), jnp.int32)
    m1 = jnp.ones((1, 4))
    pr = jnp.zeros((1, 5, 8), jnp.int32)
    pm = jnp.ones((1, 5))
    ar = AR(1024, d_model=32, n_heads=4, n_layers=1, remat=False,
            dtype=jnp.float32)
    save_bundle(
        tmp_path / "ar",
        ar.init(rng, text, m1, pr, pm, jnp.zeros((1, 5), jnp.int32),
                jnp.ones((1, 5))),
        {"model": "ar", "num_tokens": 1024, "d_model": 32, "n_heads": 4,
         "n_layers": 1}, symmap, {"spk0": 0},
    )
    nar = NAR(1024, d_model=32, n_heads=4, n_layers=1, remat=False,
              dtype=jnp.float32)
    save_bundle(
        tmp_path / "nar",
        nar.init(rng, text, m1, pr, pm, jnp.zeros((1, 5, 8), jnp.int32),
                 jnp.ones((1, 5)), jnp.zeros((1,), jnp.int32)),
        {"model": "nar", "num_tokens": 1024, "d_model": 32, "n_heads": 4,
         "n_layers": 1}, symmap, {"spk0": 0},
    )

    cfg_yaml = tmp_path / "cfg.yml"
    cfg_yaml.write_text(
        f"data_dirs: [{data.parent}]\n"
        "spkr_name_getter: 'parts:-2'\n"
        "min_phones: 3\n"
        "max_text_len: 12\n"
        "max_prom_len: 16\n"
        f"log_root: {tmp_path / 'logs'}\n"
        f"ckpt_root: {tmp_path / 'ckpts'}\n"
    )
    out = tmp_path / "heldout_ar.json"
    monkeypatch.setattr(sys, "argv", [
        "heldout_eval.py", str(tmp_path / "ar"),
        "--nar-bundle", str(tmp_path / "nar"),
        "--out", str(out), "--n", "2", "--resp-bucket", "24",
        f"yaml={cfg_yaml}",
    ])
    spec = importlib.util.spec_from_file_location(
        "heldout_eval", REPO / "scripts" / "heldout_eval.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()

    report = json.loads(out.read_text())
    assert report["summary"]["first_stage"] == "ar"
    assert report["summary"]["decode"] == "ar"
    # 95/5 split of 24 utts yields 1 val utterance; the script takes
    # min(--n, available)
    assert report["summary"]["n_utts"] >= 1
    assert len(report["per_utt"]) == report["summary"]["n_utts"]
    assert "acc" in report["summary"]["mean"]
