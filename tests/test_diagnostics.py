"""Diagnostic + artifact-saver tests (SURVEY §5.1/5.5): stats correctness
against direct computation (the reference's diagnostic self-test checks
hook-gathered grad stats against p.grad.norm(), ``diagnostic.py:191-211``),
flax intermediates capture, and iteration-gated artifact paths."""

import numpy as np
import pytest

from tts_with_diffusion_model_tpu.utils.diagnostic import (
    Diagnostic,
    singular_values,
    tensor_stats,
)


def test_tensor_stats_match_direct():
    x = np.array([[-1.0, 2.0], [3.0, -4.0]])
    s = tensor_stats(x)
    assert s["abs"] == pytest.approx(2.5)
    assert s["pos"] == pytest.approx(0.5)
    assert s["val"] == pytest.approx(0.0)
    assert s["rms"] == pytest.approx(np.sqrt(np.mean(x**2)))
    assert s["min"] == -4.0 and s["max"] == 3.0 and s["cnt"] == 4


def test_singular_values_rank():
    rng = np.random.default_rng(0)
    # rank-2 matrix: third singular value ≈ 0
    a = rng.normal(size=(50, 2)) @ rng.normal(size=(2, 8))
    s = singular_values(a)
    assert s[0] > s[1] > 1e-6
    assert s[2] < 1e-8


def test_diagnostic_with_flax_intermediates_and_grads(tmp_path):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(8, name="d1")(x)
            return nn.Dense(2, name="d2")(nn.relu(x))

    m = M()
    x = jnp.ones((4, 3))
    params = m.init(jax.random.PRNGKey(0), x)

    diag = Diagnostic(log_dir=tmp_path)
    # forward stats via capture_intermediates (the hook replacement)
    out, state = m.apply(params, x, capture_intermediates=True)
    diag.observe_intermediates(state["intermediates"])
    # grad stats straight from the grad pytree
    grads = jax.grad(lambda p: (m.apply(p, x) ** 2).sum())(params)
    diag.observe_grads(grads)

    df = diag.table()
    assert len(df) > 0
    names = set(df["name"])
    assert any("d1" in n for n in names)
    assert any(n.startswith("grad.") for n in names)

    # grad rms in the table equals direct computation
    k = grads["params"]["d1"]["kernel"]
    direct_rms = float(np.sqrt(np.mean(np.asarray(k) ** 2)))
    row = df[df["name"] == "grad.params.d1.kernel"].iloc[0]
    assert row["rms_p50"] == pytest.approx(direct_rms, rel=1e-6)

    path = diag.save(iteration=7)
    assert path is not None and path.exists()
    assert "000007" in path.name


def test_artifact_path_scheme(tmp_path, monkeypatch):
    from tts_with_diffusion_model_tpu.train import trainer
    from tts_with_diffusion_model_tpu.utils import artifacts

    class FakeCfg:
        save_artifacts_every = 2
        log_dir = tmp_path

    class FakeEngines(dict):
        cfg = FakeCfg()
        global_step = 4

    monkeypatch.setattr(trainer, "_engines", FakeEngines())
    assert artifacts.is_saving()
    wav = np.zeros(100, np.float32)
    p = artifacts.save_wav("eval", wav)
    assert p is not None
    assert p.name == "000004.wav"
    assert "artifacts" in str(p)

    # off-cadence step does not save
    FakeEngines.global_step = 5
    monkeypatch.setattr(trainer, "_engines", FakeEngines())
    assert not artifacts.is_saving()
    assert artifacts.save_wav("eval", wav) is None
