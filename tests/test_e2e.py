"""End-to-end pipeline test: the BASELINE config-5 shape — text + prompt wav
→ first stage (AR and diffusion variants) → NAR → codec decode → wav file —
run with tiny models through the real CLI entrypoint."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_with_diffusion_model_tpu.export import load_bundle, save_bundle
from tts_with_diffusion_model_tpu.models import AR, NAR
from tts_with_diffusion_model_tpu.models.diffusion import (
    DiffusionConfig,
    DiffusionModel,
)

V = 1024


@pytest.fixture(scope="module")
def zoo(tmp_path_factory):
    """Export tiny AR, NAR, and diffusion bundles plus a reference wav."""
    root = tmp_path_factory.mktemp("zoo")
    rng = jax.random.PRNGKey(0)

    phone_symmap = {p: i for i, p in enumerate(
        ["<s>", "</s>", "_", "AY1", "M", "HH", "IY1", "R", "T", "UW1", "EY1",
         "K", "S", "AH1", "N", "OY1", "Z", "DH", "AH0", "B", "D", "EH1", "L",
         "OW1", "AA1", "F", "G", "IH1", "IH0", "P", "V", "W", "Y", "AE1",
         "ER0", "ER1", "NG", "CH", "SH", "TH", "JH", "UH1", "AW1", "AO1"], 1)}
    spkr_symmap = {"ref": 0}

    ar = AR(V, d_model=32, n_heads=4, n_layers=2, remat=False, dtype=jnp.float32)
    t = jnp.zeros((1, 4), jnp.int32)
    m1 = jnp.ones((1, 4))
    pr = jnp.zeros((1, 6, 8), jnp.int32)
    pm = jnp.ones((1, 6))
    r = jnp.zeros((1, 5), jnp.int32)
    rm = jnp.ones((1, 5))
    ar_params = ar.init(rng, t, m1, pr, pm, r, rm)
    save_bundle(
        root / "ar", ar_params,
        {"model": "ar", "num_tokens": V, "d_model": 32, "n_heads": 4,
         "n_layers": 2},
        phone_symmap, spkr_symmap,
    )

    nar = NAR(V, d_model=32, n_heads=4, n_layers=2, remat=False, dtype=jnp.float32)
    r8 = jnp.zeros((1, 5, 8), jnp.int32)
    ql = jnp.zeros((1,), jnp.int32)
    nar_params = nar.init(rng, t, m1, pr, pm, r8, rm, ql)
    save_bundle(
        root / "nar", nar_params,
        {"model": "nar", "num_tokens": V, "d_model": 32, "n_heads": 4,
         "n_layers": 2},
        phone_symmap, spkr_symmap,
    )

    dcfg = DiffusionConfig(n_classes=V + 1, d_model=32, n_heads=4, n_layers=1,
                           timesteps=8, resp_len=48, text_len=24, prom_len=32,
                           gen_len=40)
    dm = DiffusionModel(dcfg, dtype=jnp.float32)
    d_params = dm.init(rng)
    save_bundle(
        root / "diffusion", d_params,
        {"model": "diffusion", "num_tokens": V, "d_model": 32, "n_heads": 4,
         "n_layers": 1, "timesteps": 8, "resp_len": 48, "text_len": 24,
         "prom_len": 32, "gen_len": 40},
        phone_symmap, spkr_symmap,
    )

    from tts_with_diffusion_model_tpu.models.gaussian_tts import (
        GaussianConfig,
        GaussianDiffusionModel,
    )

    gcfg = GaussianConfig(n_tokens=V, d_model=32, n_heads=4, n_layers=1,
                          timesteps=6, resp_len=48, text_len=24, prom_len=32,
                          gen_len=40)
    gm = GaussianDiffusionModel(gcfg, dtype=jnp.float32)
    save_bundle(
        root / "gaussian", gm.init(rng),
        {"model": "diffusion-gaussian", "num_tokens": V, "d_model": 32,
         "n_heads": 4, "n_layers": 1, "timesteps": 6, "resp_len": 48,
         "text_len": 24, "prom_len": 32, "gen_len": 40},
        phone_symmap, spkr_symmap,
    )

    # short reference wav (0.2 s) keeps codec encode cheap on CPU
    from tts_with_diffusion_model_tpu.audio.wavio import write_wav

    sr = 24_000
    tt = np.linspace(0, 0.2, int(sr * 0.2), endpoint=False)
    write_wav(root / "ref.wav", 0.3 * np.sin(2 * np.pi * 220 * tt), sr)
    return root


def _run_cli(zoo, monkeypatch, tmp_path, first_stage: str, extra=()):
    from tts_with_diffusion_model_tpu.__main__ import main

    out = tmp_path / f"out_{first_stage}.wav"
    argv = [
        "prog", "I am here", str(zoo / "ref.wav"), str(out),
        "--ar-ckpt", str(zoo / first_stage),
        "--nar-ckpt", str(zoo / "nar"),
        "--max-ar-steps", "6",
        *extra,
    ]
    monkeypatch.setattr(sys, "argv", argv)
    main()
    return out


def test_cli_ar_pipeline(zoo, monkeypatch, tmp_path):
    out = _run_cli(zoo, monkeypatch, tmp_path, "ar")
    from tts_with_diffusion_model_tpu.audio.wavio import read_wav

    wav, sr = read_wav(out)
    assert sr == 24_000
    assert wav.shape[1] > 0


def test_cli_diffusion_pipeline(zoo, monkeypatch, tmp_path):
    out = _run_cli(zoo, monkeypatch, tmp_path, "diffusion")
    from tts_with_diffusion_model_tpu.audio.wavio import read_wav

    wav, sr = read_wav(out)
    assert sr == 24_000
    assert wav.shape[1] > 0


def test_cli_diffusion_stride_sampling(zoo, monkeypatch, tmp_path):
    """--stride 3 runs the skip-step sampler (closed-form interval
    posterior) through the real CLI; output shape matches the full
    sampler's."""
    out = _run_cli(zoo, monkeypatch, tmp_path, "diffusion",
                   extra=("--stride", "3"))
    from tts_with_diffusion_model_tpu.audio.wavio import read_wav

    wav, sr = read_wav(out)
    assert sr == 24_000 and wav.shape[1] == 40 * 320  # gen_len frames


def test_cli_diffusion_maskgit_decode(zoo, monkeypatch, tmp_path):
    """--decode maskgit runs confidence-ordered parallel decoding through
    the real CLI entrypoint; output covers the full generation bucket."""
    out = _run_cli(zoo, monkeypatch, tmp_path, "diffusion",
                   extra=("--decode", "maskgit", "--maskgit-steps", "4"))
    from tts_with_diffusion_model_tpu.audio.wavio import read_wav

    wav, sr = read_wav(out)
    assert sr == 24_000 and wav.shape[1] == 40 * 320  # gen_len frames


def test_cli_longform_auto_engages(zoo, monkeypatch, tmp_path):
    """Text over the diffusion first stage's 24-phone bucket routes through
    long-form: ≥2 chained 40-frame segments in one seam-free decode
    (the reference CLI would truncate, ``ar_discrete.py:592-626``)."""
    from tts_with_diffusion_model_tpu.__main__ import main

    out = tmp_path / "out_long.wav"
    argv = [
        "prog",
        "I am here to make some noise and then make even more noise today",
        str(zoo / "ref.wav"), str(out),
        "--ar-ckpt", str(zoo / "diffusion"),
        "--nar-ckpt", str(zoo / "nar"),
        "--fp32",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    main()
    from tts_with_diffusion_model_tpu.audio.wavio import read_wav

    wav, sr = read_wav(out)
    frames = wav.shape[1] // 320  # codec hop
    assert frames >= 2 * 40 and frames % 40 == 0


def test_cli_ar_longform_auto_engages(zoo, monkeypatch, tmp_path):
    """AR bundles engage long-form too, past the 50-phone serving bucket
    (ADVICE r2: the capacity check previously covered only diffusion first
    stages, so over-long AR requests ran the whole text through one ragged
    generation instead of chained segments)."""
    from tts_with_diffusion_model_tpu.__main__ import main

    out = tmp_path / "out_ar_long.wav"
    long_text = (
        "I am here to make some noise and then make even more noise today "
        "and tomorrow we will keep on making noise until everyone hears it"
    )
    argv = [
        "prog", long_text,
        str(zoo / "ref.wav"), str(out),
        "--ar-ckpt", str(zoo / "ar"),
        "--nar-ckpt", str(zoo / "nar"),
        "--fp32", "--max-ar-steps", "8",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    main()
    from tts_with_diffusion_model_tpu.audio.wavio import read_wav

    wav, sr = read_wav(out)
    assert sr == 24_000 and wav.shape[1] > 0


def test_cli_gaussian_longform_auto_engages(zoo, monkeypatch, tmp_path):
    """Gaussian bundles engage long-form past *their own* text bucket
    (r3 review: the capacity check special-cased DiffusionModel, so a
    Gaussian bundle with text_len=24 fell through to the 50-phone AR
    bucket and silently truncated 25-50-phone texts to 24 phones)."""
    from tts_with_diffusion_model_tpu.__main__ import main

    out = tmp_path / "out_gauss_long.wav"
    argv = [
        "prog",
        # ~40 phones: over the Gaussian bucket (24) but under the AR
        # bucket (50) — exactly the range the bug silently truncated.
        "I am here to make some noise and more noise",
        str(zoo / "ref.wav"), str(out),
        "--ar-ckpt", str(zoo / "gaussian"),
        "--nar-ckpt", str(zoo / "nar"),
        "--fp32",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    main()
    from tts_with_diffusion_model_tpu.audio.wavio import read_wav

    wav, sr = read_wav(out)
    frames = wav.shape[1] // 320
    assert frames >= 2 * 40 and frames % 40 == 0


def test_cli_speculative_decoding_greedy_identical(zoo, monkeypatch, tmp_path):
    """--draft-ckpt at --temperature 0 produces byte-identical audio to
    the plain greedy run (speculative greedy exactness, end-to-end through
    the real CLI; the draft here is the target bundle itself — the
    all-accept path)."""
    base = _run_cli(zoo, monkeypatch, tmp_path, "ar",
                    extra=("--temperature", "0"))
    base_bytes = base.read_bytes()
    spec = tmp_path / "out_spec.wav"
    import sys as _sys

    from tts_with_diffusion_model_tpu.__main__ import main

    argv = [
        "prog", "I am here", str(zoo / "ref.wav"), str(spec),
        "--ar-ckpt", str(zoo / "ar"), "--nar-ckpt", str(zoo / "nar"),
        "--max-ar-steps", "6", "--temperature", "0",
        "--draft-ckpt", str(zoo / "ar"), "--spec-k", "3",
    ]
    monkeypatch.setattr(_sys, "argv", argv)
    main()
    assert spec.read_bytes() == base_bytes


def test_bundle_roundtrip(zoo):
    params, meta, phone_symmap, spkr_symmap = load_bundle(zoo / "ar")
    assert meta["model"] == "ar"
    assert phone_symmap["<s>"] == 1
    assert "params" in params


def test_cli_longform_maskgit(zoo, monkeypatch, tmp_path):
    """Long-form + --decode maskgit: the CLI passes the decode choice into
    the long-form Synthesizer, so chained segments run confidence decoding
    too (previously only the single-bucket path honored the flag)."""
    from tts_with_diffusion_model_tpu.__main__ import main

    out = tmp_path / "out_long_mg.wav"
    argv = [
        "prog",
        "I am here to make some noise and then make even more noise today",
        str(zoo / "ref.wav"), str(out),
        "--ar-ckpt", str(zoo / "diffusion"),
        "--nar-ckpt", str(zoo / "nar"),
        "--fp32", "--decode", "maskgit", "--maskgit-steps", "3",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    main()
    from tts_with_diffusion_model_tpu.audio.wavio import read_wav

    wav, sr = read_wav(out)
    frames = wav.shape[1] // 320
    assert frames >= 2 * 40 and frames % 40 == 0
