"""Pallas kernel tests (interpret mode on CPU): the fused attention kernel
must match the XLA reference path bit-for-bit up to fp tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from tts_with_diffusion_model_tpu.ops.attention import dense_attention
from tts_with_diffusion_model_tpu.ops.flash_attention import (
    flash_attention,
    supported,
)


def _inputs(B=2, Tq=16, Tk=24, H=2, Dh=8, dtype=jnp.float32, seed=0):
    rng = jax.random.PRNGKey(seed)
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    q = jax.random.normal(r1, (B, Tq, H, Dh), dtype)
    k = jax.random.normal(r2, (B, Tk, H, Dh), dtype)
    v = jax.random.normal(r3, (B, Tk, H, Dh), dtype)
    mask = (jax.random.uniform(r4, (B, Tq, Tk)) > 0.3).astype(jnp.float32)
    # ensure no fully-masked row ambiguity: open first key for every query
    mask = mask.at[:, :, 0].set(1.0)
    return q, k, v, mask


def test_flash_matches_dense_fp32():
    q, k, v, mask = _inputs()
    ref = dense_attention(q, k, v, pair_mask=mask)
    got = flash_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_flash_matches_dense_bf16():
    q, k, v, mask = _inputs(dtype=jnp.bfloat16)
    ref = dense_attention(q, k, v, pair_mask=mask)
    got = flash_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_flash_causal_mask():
    B, T, H, Dh = 1, 12, 2, 8
    q, k, v, _ = _inputs(B=B, Tq=T, Tk=T, H=H, Dh=Dh)
    causal = jnp.tril(jnp.ones((T, T)))[None]
    ref = dense_attention(q, k, v, pair_mask=causal)
    got = flash_attention(q, k, v, causal, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_supported_shapes():
    assert supported((1, 448, 8, 64), (1, 448, 8, 64))
    assert not supported((1, 2048, 8, 64), (1, 2048, 8, 64))
    assert not supported((1, 64, 8, 63), (1, 64, 8, 63))
