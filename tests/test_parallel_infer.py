"""Mesh-sharded (SPMD) D3PM inference: parallel/infer.py.

The reference's inference is single-GPU only (``vall_e/__main__.py:50``);
the rebuild runs the reverse loop SPMD over a dp×tp mesh.  These tests pin
the contract on the 8-virtual-device CPU mesh:

  - dp×tp sharded generation returns the SAME tokens as single-device
    generation (dp rows are embarrassingly parallel; tp splits matmuls
    with XLA collectives — logit margins absorb the reassociation);
  - outputs are dp-invariant by construction (per-row keys);
  - non-dividing batch sizes fail loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_with_diffusion_model_tpu.models.diffusion import (
    DiffusionConfig,
    DiffusionModel,
)
from tts_with_diffusion_model_tpu.parallel.infer import (
    make_sharded_generate,
    shard_params,
)
from tts_with_diffusion_model_tpu.parallel.mesh import build_mesh

V = 33


@pytest.fixture(scope="module")
def setup():
    cfg = DiffusionConfig(
        n_classes=V, d_model=32, n_heads=4, n_layers=2, timesteps=6,
        resp_len=16, text_len=5, prom_len=7, gen_len=12,
    )
    m = DiffusionModel(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = m.init(rng)
    B = 4
    k1, k2 = jax.random.split(rng)
    text = jax.random.randint(k1, (B, 5), 1, V)
    tm = jnp.ones((B, 5))
    proms = jax.random.randint(k2, (B, 7, 8), 0, V)
    pm = jnp.ones((B, 7))
    gen_rng = jax.random.PRNGKey(7)
    ref = np.asarray(
        m.generate(params, text, tm, proms, pm, gen_rng)
    )
    return m, params, (text, tm, proms, pm), gen_rng, ref


@pytest.mark.parametrize("dp,tp", [(4, 2), (1, 2), (4, 1)])
def test_sharded_generate_matches_single_device(setup, dp, tp):
    m, params, (text, tm, proms, pm), gen_rng, ref = setup
    mesh = build_mesh(dp, tp, jax.devices("cpu")[: dp * tp])
    p = shard_params(mesh, params)
    gen = make_sharded_generate(m, mesh)
    out = np.asarray(gen(p, text, tm, proms, pm, gen_rng))
    np.testing.assert_array_equal(out, ref)


def test_sharded_generate_stride_and_bucket(setup):
    """stride / resp_bucket knobs work through the sharded path too."""
    m, params, (text, tm, proms, pm), gen_rng, _ = setup
    mesh = build_mesh(2, 2, jax.devices("cpu")[:4])
    p = shard_params(mesh, params)
    gen = make_sharded_generate(m, mesh)
    ref = np.asarray(
        m.generate(params, text, tm, proms, pm, gen_rng, stride=2,
                   resp_bucket=12)
    )
    out = np.asarray(
        gen(p, text, tm, proms, pm, gen_rng, stride=2, resp_bucket=12)
    )
    np.testing.assert_array_equal(out, ref)


def test_sharded_generate_rejects_ragged_batch(setup):
    m, params, (text, tm, proms, pm), gen_rng, _ = setup
    mesh = build_mesh(8, 1, jax.devices("cpu")[:8])
    p = shard_params(mesh, params)
    gen = make_sharded_generate(m, mesh)
    with pytest.raises(ValueError, match="dp mesh axis"):
        gen(p, text, tm, proms, pm, gen_rng)  # B=4 does not divide dp=8
