"""Train-entrypoint smoke test: the full ``python -m ..train yaml=<cfg>``
path — config parse → dataset build → engine → a few real steps → periodic
checkpoint + eval — on synthetic data with a tiny model (the rebuild's
equivalent of the reference's config/test run-to-convergence checks,
SURVEY §4.2)."""

import numpy as np
import pytest
import yaml

from tts_with_diffusion_model_tpu.config import Config

PHONES = ["AA", "B", "IY", "K", "S", "T", "M", "N", "OW", "EH", "R", "L"]


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    rng = np.random.default_rng(0)
    for spkr in ["s1", "s2"]:
        d = root / spkr
        d.mkdir()
        for i in range(4):
            t = int(rng.integers(20, 40))
            np.save(d / f"u{i}.qnt.npy",
                    rng.integers(0, 1024, size=(8, t)).astype(np.int16))
            phones = rng.choice(PHONES, size=int(rng.integers(12, 25)))
            (d / f"u{i}.phn.txt").write_text(" ".join(phones))
    return root


def _write_cfg(tmp_path, data_dir, model: str, extra: dict | None = None):
    cfg = {
        "data_dirs": [str(data_dir)],
        "spkr_name_getter": "parts:-2",
        "model": model,
        "model_overrides": {"d_model": 32, "n_heads": 2, "n_layers": 1,
                            "timesteps": 4, "resp_len": 24, "text_len": 16,
                            "prom_len": 24, "gen_len": 20},
        "batch_size": 2,
        "eval_batch_size": 2,
        "max_iter": 2,
        "eval_every": 2,
        "save_ckpt_every": 2,
        "max_num_val": 2,
        "max_text_len": 32,
        "max_prom_len": 64,
        "max_resp_len": 48,
        "warmup_num_steps": 2,
        "mesh_dp": 1,
        "mesh_tp": 1,
        "log_root": str(tmp_path / "logs"),
        "ckpt_root": str(tmp_path / "ckpts"),
        **(extra or {}),
    }
    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump(cfg))
    return p


@pytest.mark.parametrize("model", ["ar", "nar", "diffusion"])
@pytest.mark.slow
def test_train_main_smoke(tmp_path, data_dir, model):
    from tts_with_diffusion_model_tpu.train.train import main

    cfg_path = _write_cfg(tmp_path, data_dir, model)
    cfg = Config.from_cli(argv=[f"yaml={cfg_path}"])
    assert cfg.model == model
    assert cfg.model_overrides["d_model"] == 32

    main(cfg)

    # checkpoint written at step 2 (save_ckpt_every=2)
    ckpts = list((tmp_path / "ckpts").rglob("step_*"))
    assert ckpts, "expected a checkpoint after max_iter steps"
    # cfg.json + log.txt written
    assert list((tmp_path / "logs").rglob("cfg.json"))
    logs = list((tmp_path / "logs").rglob("log.txt"))
    assert logs
    text = logs[0].read_text()
    assert "global_step" in text  # JSON stat lines present


@pytest.mark.slow
def test_train_resumes_from_checkpoint(tmp_path, data_dir):
    """Second run with max_iter=3 must resume at step 2, not restart."""
    from tts_with_diffusion_model_tpu.train.train import load_engines, main

    cfg_path = _write_cfg(tmp_path, data_dir, "ar")
    cfg = Config.from_cli(argv=[f"yaml={cfg_path}"])
    main(cfg)

    engines = load_engines(cfg)
    assert engines.global_step == 2


@pytest.mark.slow
def test_train_main_eval_decode_audio(tmp_path, data_dir):
    """Eval wav dumps (re-enabled reference eval body) produce hyp/ref files."""
    from tts_with_diffusion_model_tpu.train.train import main

    cfg_path = _write_cfg(
        tmp_path, data_dir, "diffusion",
        extra={"eval_decode_audio": True, "max_val_ar_steps": 8},
    )
    cfg = Config.from_cli(argv=[f"yaml={cfg_path}"])
    main(cfg)

    wavs = list((tmp_path / "logs").rglob("*.wav"))
    assert any("ref" in str(w) for w in wavs)
    assert any("hyp" in str(w) for w in wavs)

    # Objective metrics land next to the wav dumps: mean token accuracy
    # per level + DTW-MCD (utils/metrics.py), one JSON per eval tick.
    import json

    metric_files = list((tmp_path / "logs").rglob("metrics.json"))
    assert metric_files, "eval tick should write metrics.json"
    blob = json.loads(metric_files[0].read_text())
    assert blob["mean"]["n_utts"] >= 1
    assert "acc" in blob["mean"] and "mcd" in blob["mean"]
    assert 0.0 <= blob["mean"]["acc"] <= 1.0
    assert blob["mean"]["mcd"] >= 0.0
