"""Pallas kernel tests (interpret mode on CPU): the fused attention kernel
must match the XLA reference path up to fp tolerance, forward and backward
(the backward recomputes through the dense path via custom_vjp)."""

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
    kv_mask = (jax.random.uniform(r4, (B, Tk)) > 0.3).astype(jnp.float32)
    kv_mask = kv_mask.at[:, 0].set(1.0)  # no fully-masked rows
    return q, k, v, kv_mask


def _dense(q, k, v, kv_mask):
    pair = jnp.broadcast_to(
        kv_mask[:, None, :], (q.shape[0], q.shape[1], k.shape[1])
    )
    return dense_attention(q, k, v, pair_mask=pair)


def test_flash_matches_dense_fp32():
    q, k, v, km = _inputs()
    ref = _dense(q, k, v, km)
    got = flash_attention(q, k, v, km, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_flash_matches_dense_bf16():
    q, k, v, km = _inputs(dtype=jnp.bfloat16)
    ref = _dense(q, k, v, km)
    got = flash_attention(q, k, v, km, True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_flash_serving_shape():
    q, k, v, km = _inputs(B=1, Tq=64, Tk=64, H=8, Dh=64)
    ref = _dense(q, k, v, km)
    got = flash_attention(q, k, v, km, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_flash_backward_matches_dense():
    q, k, v, km = _inputs(B=1, Tq=8, Tk=12, H=2, Dh=8)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, km, True) ** 2).sum()

    def loss_dense(q, k, v):
        return (_dense(q, k, v, km) ** 2).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_supported_shapes():
    assert supported((1, 448, 8, 64), (1, 448, 8, 64))
    assert supported((8, 448, 8, 64), (8, 448, 8, 64))
    assert not supported((1, 2048, 8, 64), (1, 2048, 8, 64))
    assert not supported((1, 64, 8, 63), (1, 64, 8, 63))


def test_attn_impl_flash_falls_back_to_dense_off_tpu():
    """`impl="flash"` (the fully-fused library train kernel) is TPU-only;
    off-TPU `cross_attention` must silently take the dense path so CPU
    training/tests of a flash-configured model stay correct."""
    from tts_with_diffusion_model_tpu.ops.attention import cross_attention

    q, k, v, km = _inputs()
    ref = cross_attention(q, k, v, kv_mask=km)
    got = cross_attention(q, k, v, kv_mask=km, impl="flash")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_attn_impl_threads_to_dit_blocks():
    """cfg.attn_impl reaches every DiT block's self-attention MHA (and only
    the self-attention — cross-attention stays dense, see DiTBlock)."""
    from tts_with_diffusion_model_tpu.models import get_model

    model = get_model(
        "diffusion",
        overrides={"d_model": 32, "n_heads": 2, "n_layers": 2,
                   "attn_impl": "flash"},
    )
    den = model.denoiser
    assert den.attn_impl == "flash"
    bound = den.bind(model.init(jax.random.PRNGKey(0)))
    for blk in bound.blocks:
        assert blk.attn.attn_impl == "flash"
        assert blk.cross_attn.attn_impl is None
        assert blk.cross_attn2.attn_impl is None


def test_slot_causality_equals_pos_causality_on_packed_layout():
    """The invariant the packed backbone's flash path relies on: with pads
    only at segment tails, slot-order causality + key masking (what the
    library kernel computes) equals the backbone's pos-causal mask
    (pos = cumsum(mask)-1) at every VALID query position."""
    from tts_with_diffusion_model_tpu.models.base import packed_layout

    B = 3
    rng = np.random.default_rng(0)
    tm = (np.arange(6)[None] < rng.integers(2, 7, (B, 1))).astype(np.float32)
    pm = (np.arange(10)[None] < rng.integers(3, 11, (B, 1))).astype(np.float32)
    rm = (np.arange(8)[None] < rng.integers(2, 9, (B, 1))).astype(np.float32)
    mask, pos, _ = packed_layout(
        jnp.asarray(tm), jnp.asarray(pm), jnp.asarray(rm)
    )
    mask, pos = np.asarray(mask), np.asarray(pos)
    T = mask.shape[1]

    pos_causal = mask[:, :, None] * mask[:, None, :] * (
        pos[:, None, :] <= pos[:, :, None]
    )
    slot = np.arange(T)
    slot_causal = mask[:, None, :] * (slot[None, :] <= slot[:, None])[None]

    valid_q = mask.astype(bool)
    np.testing.assert_array_equal(
        pos_causal[valid_q], slot_causal[valid_q]
    )


def test_attn_impl_threads_to_packed_backbone():
    """attn_impl reaches every PrenormBlock's Attention in AR and NAR."""
    from tts_with_diffusion_model_tpu.models import get_model

    for name in ("ar-quarter", "nar-quarter"):
        model = get_model(
            name, overrides={"n_layers": 2, "attn_impl": "flash"})
        B = 1
        t = jnp.zeros((B, 4), jnp.int32)
        tm = jnp.ones((B, 4))
        pr = jnp.zeros((B, 6, 8), jnp.int32)
        pm = jnp.ones((B, 6))
        if name.startswith("ar"):
            params = model.init(jax.random.PRNGKey(0), t, tm, pr, pm,
                                jnp.zeros((B, 5), jnp.int32),
                                jnp.ones((B, 5)))
        else:
            params = model.init(jax.random.PRNGKey(0), t, tm, pr, pm,
                                jnp.zeros((B, 5, 8), jnp.int32),
                                jnp.ones((B, 5)),
                                jnp.zeros((B,), jnp.int32))
        bound = model.bind(params)
        for blk in bound.base.blocks:
            assert blk.attn.attn_impl == "flash", name
