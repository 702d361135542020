"""Attention ops: XLA reference implementation + Pallas fused kernel.

The reference computes dense masked attention with einsums and a
``-finfo.max`` fill (``vall_e/vall_e/base.py:113-127``).  On TPU the same
math runs as one fused region under XLA; for longer sequences a Pallas
flash-attention kernel (``flash_attention``) avoids materializing the
(B, T, T, H) score tensor in HBM.

``dense_attention`` is the semantically-exact path used by default for the
short (≤ ~1k token) sequences this workload produces; the Pallas kernel is
wired in via ``use_flash`` when shapes are tile-aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

_backend_cache: str | None = None


def _on_tpu() -> bool:
    global _backend_cache
    if _backend_cache is None:
        try:
            _backend_cache = jax.devices()[0].platform
        except Exception:
            _backend_cache = "cpu"
    return _backend_cache in ("tpu", "axon")


def dense_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pair_mask: jax.Array | None = None,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Dense multi-head attention.

    Args:
        q, k, v: (B, T, H, Dh)
        pair_mask: (B, Tq, Tk) 1 = attend, 0 = block.
        bias: optional additive (B, Tq, Tk) or (B, H, Tq, Tk).
    Returns:
        (B, Tq, H, Dh)
    """
    # Optional: the fused Pallas kernel keeps scores in VMEM on TPU.
    # Opt-in via TTS_TPU_FLASH_ATTENTION=1 — measured on v5e, XLA's fused
    # path wins at the B=1, T≤448 shapes of the D3PM sampler (5249 vs 4303
    # tok/s end-to-end), so the default stays XLA until the kernel is tuned
    # for small-batch grids.
    import os

    if (
        os.environ.get("TTS_TPU_FLASH_ATTENTION") == "1"
        and bias is None
        and pair_mask is not None
        and _on_tpu()
    ):
        from .flash_attention import flash_attention, supported

        if supported(q.shape, k.shape):
            return flash_attention(q, k, v, pair_mask)

    scale = q.shape[-1] ** -0.5
    # fp32 scores for a stable softmax regardless of the activation dtype.
    scores = jnp.einsum(
        "bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if bias is not None:
        if bias.ndim == 3:
            bias = bias[:, None]
        scores = scores + bias.astype(scores.dtype)
    if pair_mask is not None:
        scores = jnp.where(pair_mask[:, None].astype(bool), scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhij,bjhd->bihd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_mask: jax.Array | None = None,
    kv_mask: jax.Array | None = None,
) -> jax.Array:
    """Cross attention with independent query/key masks.

    q: (B, Tq, H, Dh); k, v: (B, Tk, H, Dh); masks (B, Tq) / (B, Tk).
    """
    pair = None
    if q_mask is not None or kv_mask is not None:
        B, Tq = q.shape[:2]
        Tk = k.shape[1]
        qm = q_mask if q_mask is not None else jnp.ones((B, Tq))
        km = kv_mask if kv_mask is not None else jnp.ones((B, Tk))
        pair = qm[:, :, None] * km[:, None, :]
    return dense_attention(q, k, v, pair_mask=pair)
