"""The ``use_fp16`` knob must actually reach the matmuls.

Round-3 threads a compute ``dtype`` through every denoiser submodule
(``models/{base,dit,gaussian_tts,unet}.py``): under bf16 the Dense/Conv/MHA
projections cast both operands to bf16 inside the kernel (params stay fp32
masters, the output head stays fp32 for a stable loss).  These tests pin
that contract — without them a refactor could silently drop the dtype on
one submodule and revert its matmuls to fp32, and nothing else would fail
(the reference's analogous toggle is ``vall_e/config.py:57-60`` fp16).
"""

import jax
import jax.numpy as jnp
import pytest


def _leaf_dtypes(tree):
    return {x.dtype for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "dtype")}


def _has_bf16_intermediate(intermediates):
    found = []

    def visit(node):
        if isinstance(node, dict):
            for v in node.values():
                visit(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                visit(v)
        elif hasattr(node, "dtype"):
            found.append(node.dtype)

    visit(intermediates)
    return jnp.bfloat16 in found


def test_d3pm_bf16_compute_reaches_matmuls_and_matches_fp32():
    from tts_with_diffusion_model_tpu.models.diffusion import (
        DiffusionConfig,
        DiffusionModel,
    )

    cfg = DiffusionConfig(
        n_classes=33, d_model=64, n_heads=4, n_layers=2, timesteps=8,
        resp_len=16, text_len=6, prom_len=8, gen_len=16,
    )
    m32 = DiffusionModel(cfg, dtype=jnp.float32)
    m16 = DiffusionModel(cfg, dtype=jnp.bfloat16)

    # fp32 master params regardless of compute dtype, identical init.
    params = m32.init(jax.random.PRNGKey(0))
    p16 = m16.init(jax.random.PRNGKey(0))
    assert _leaf_dtypes(params) == {jnp.dtype(jnp.float32)}
    assert _leaf_dtypes(p16) == {jnp.dtype(jnp.float32)}

    batch = dict(
        text=jnp.full((2, 6), 3), text_mask=jnp.ones((2, 6)),
        proms=jnp.zeros((2, 8, 8), jnp.int32), prom_mask=jnp.ones((2, 8)),
        resp=jax.random.randint(jax.random.PRNGKey(5), (2, 16), 0, 32),
        resp_mask=jnp.ones((2, 16)),
    )

    # Same rng → same q_sample corruption → the only difference is compute
    # precision; the masked-CE losses must agree to bf16 tolerance.
    l32, _ = m32.loss(params, batch, jax.random.PRNGKey(1))
    l16, _ = m16.loss(params, batch, jax.random.PRNGKey(1))
    assert jnp.isfinite(l16)
    assert abs(float(l32) - float(l16)) / abs(float(l32)) < 0.05, (
        float(l32), float(l16))

    # The denoiser's internals really run bf16 (and fp32 under fp32): capture
    # every submodule output and look at the dtypes that flow between them.
    x = batch["resp"]
    t = jnp.zeros((2,), jnp.int32)
    out16, st16 = m16.denoiser.apply(
        params, batch["text"], batch["text_mask"], batch["proms"],
        batch["prom_mask"], x, batch["resp_mask"], t,
        capture_intermediates=True,
    )
    out32, st32 = m32.denoiser.apply(
        params, batch["text"], batch["text_mask"], batch["proms"],
        batch["prom_mask"], x, batch["resp_mask"], t,
        capture_intermediates=True,
    )
    # Output head is pinned to fp32 in BOTH modes (loss stability).
    assert out16.dtype == jnp.float32
    assert out32.dtype == jnp.float32
    assert _has_bf16_intermediate(st16["intermediates"])
    assert not _has_bf16_intermediate(st32["intermediates"])


def test_ar_bf16_compute_reaches_blocks_and_matches_fp32():
    from tts_with_diffusion_model_tpu.models.ar import AR

    Vv, B = 33, 2
    text = jnp.full((B, 6), 3)
    tm = jnp.ones((B, 6))
    proms = jnp.zeros((B, 8, 8), jnp.int32)
    pm = jnp.ones((B, 8))
    resp = jax.random.randint(jax.random.PRNGKey(4), (B, 12), 0, Vv - 1)
    rm = jnp.ones((B, 12))

    m32 = AR(n_tokens=Vv, d_model=32, n_heads=4, n_layers=2, remat=False,
             dtype=jnp.float32)
    m16 = AR(n_tokens=Vv, d_model=32, n_heads=4, n_layers=2, remat=False,
             dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0), text, tm, proms, pm, resp, rm)
    assert _leaf_dtypes(params) == {jnp.dtype(jnp.float32)}

    lg32, _ = m32.apply(params, text, tm, proms, pm, resp, rm)
    (lg16, _), st16 = m16.apply(params, text, tm, proms, pm, resp, rm,
                                capture_intermediates=True)
    # Logit head fp32; blocks bf16; greedy next-token choice unchanged.
    assert lg16.dtype == jnp.float32
    assert _has_bf16_intermediate(st16["intermediates"])
    assert (jnp.argmax(lg16[:, -1], -1) == jnp.argmax(lg32[:, -1], -1)).all()
    # Mean absolute logit drift stays within bf16 rounding scale.
    assert float(jnp.abs(lg16 - lg32).mean()) < 0.05


@pytest.mark.parametrize("name", ["diffusion-gaussian", "diffusion-gaussian-unet2d"])
def test_gaussian_families_accept_compute_dtype(name):
    """The continuous-DDPM variants build and step under bf16 compute."""
    from tts_with_diffusion_model_tpu.models import get_model

    ov = dict(d_model=32, n_heads=2, n_layers=1, timesteps=4,
              resp_len=16, text_len=6, prom_len=8, gen_len=16)
    if "unet2d" in name:
        ov["channels"] = (16, 32)
    m = get_model(name, num_tokens=33, overrides=ov, dtype=jnp.bfloat16)
    params = m.init(jax.random.PRNGKey(0))
    assert _leaf_dtypes(params) == {jnp.dtype(jnp.float32)}
    batch = dict(
        text=jnp.full((2, 6), 3), text_mask=jnp.ones((2, 6)),
        proms=jnp.zeros((2, 8, 8), jnp.int32), prom_mask=jnp.ones((2, 8)),
        resp=jax.random.randint(jax.random.PRNGKey(5), (2, 16), 0, 32),
        resp_mask=jnp.ones((2, 16)),
    )
    out = m.loss(params, batch, jax.random.PRNGKey(1))
    loss = out[0] if isinstance(out, tuple) else out
    assert jnp.isfinite(loss)
