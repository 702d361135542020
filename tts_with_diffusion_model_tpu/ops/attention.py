"""Attention ops: XLA reference implementation + Pallas fused kernel.

The reference computes dense masked attention with einsums and a
``-finfo.max`` fill (``vall_e/vall_e/base.py:113-127``).  On TPU the same
math runs as one fused region under XLA; for longer sequences a Pallas
flash-attention kernel (``flash_attention``) avoids materializing the
(B, T, T, H) score tensor in HBM.

``dense_attention`` is the semantically-exact pair-mask path (used by the
causal packed-layout backbone); ``cross_attention`` routes through the
Pallas kernel on TPU when shapes fit (see its docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

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


def _train_flash_attention(q, k, v, kv_mask, causal: bool = False):
    """Fully-fused flash attention (forward AND backward) for training.

    Routes through the library Pallas TPU kernel
    (``jax.experimental.pallas.ops.tpu.flash_attention``), whose custom VJP
    keeps the (B, H, Tq, Tk) score tensor out of HBM in *both* passes —
    the repo's serving kernel (``ops/flash_attention.py``) fuses only the
    forward and recomputes the backward through XLA, so it never helps a
    train step.  At the D3PM train shapes (B≈192, T=192..448) the fp32
    score round-trips are the dominant HBM traffic (B·H·T² ≈ 4.9 GB/layer
    at B=192, T=896-equivalent packed work), which is what caps MFU at
    ~19% (PARITY.md) — this path exists to shed it.

    Query-side masking is intentionally dropped: padding *query* rows
    produce garbage the caller multiplies away (``x * m`` in the DiT
    block, ``to_out(o) * mask`` in the packed backbone), while padding
    *keys* are excluded via segment ids, matching ``dense_attention``'s
    semantics at every valid position.  Sequence lengths are padded to
    multiples of 128 (the kernel's kv tiling must divide the sequence;
    q padding is sliced back off).

    ``causal=True`` serves the packed-layout backbone (models/base.py):
    its mask is *pos*-causal (pos = cumsum(mask)-1), but pads only occur
    at segment tails, so over valid positions pos-causality coincides
    with the kernel's slot-causality, and pad keys are excluded by the
    segment ids either way (asserted on-chip by benchmarks/flash_parity.py
    --causal, which compares against the exact pos-causal dense mask).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
    )
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as _lib_flash,
    )

    B, Tq, H, Dh = q.shape
    Tk = k.shape[1]

    def pad_to(x, T, axis=1):
        if x.shape[axis] == T:
            return x
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, T - x.shape[axis])
        return jnp.pad(x, cfg)

    Tq_p = -(-Tq // 128) * 128
    Tk_p = -(-Tk // 128) * 128
    qp = pad_to(q, Tq_p).transpose(0, 2, 1, 3)  # (B, H, Tq_p, Dh)
    kp = pad_to(k, Tk_p).transpose(0, 2, 1, 3)
    vp = pad_to(v, Tk_p).transpose(0, 2, 1, 3)
    km = kv_mask if kv_mask is not None else jnp.ones((B, Tk))
    seg = SegmentIds(
        q=jnp.ones((B, Tq_p), jnp.int32),
        kv=pad_to(km.astype(jnp.int32), Tk_p),
    )
    blk = BlockSizes(
        block_q=128, block_k_major=128, block_k=128, block_b=1,
        block_q_major_dkv=128, block_k_major_dkv=128,
        block_k_dkv=128, block_q_dkv=128,
        block_k_major_dq=128, block_k_dq=128, block_q_dq=128,
    )
    o = _lib_flash(qp, kp, vp, segment_ids=seg, causal=causal,
                   sm_scale=float(Dh) ** -0.5, block_sizes=blk)
    return o.transpose(0, 2, 1, 3)[:, :Tq]


def cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_mask: jax.Array | None = None,
    kv_mask: jax.Array | None = None,
    impl: str | None = None,
) -> jax.Array:
    """Cross attention with independent query/key masks.

    q: (B, Tq, H, Dh); k, v: (B, Tk, H, Dh); masks (B, Tq) / (B, Tk).

    ``impl="fused"`` routes through the repo's forward-fused Pallas kernel
    (``ops/flash_attention.py``: layout-preserving blocks, vector masks,
    dense-recompute backward).  Default is the XLA path: measured on the
    attached chip at this workload's shapes, XLA's fused attention wins —
    B=1/T=448 p50 78 ms vs 93 ms, B=8 381 ms vs 504 ms per 99-step
    generation — because the per-(batch) kernel serializes head matmuls the
    MXU would otherwise batch, and the fusion only saves ~6 MB of HBM
    score traffic per call at T≤448.  The kernel remains correct + tested
    (``tests/test_pallas_ops.py``) and is the starting point if sequence
    lengths ever outgrow VMEM-resident scores (T ≳ 2k), where the HBM
    round-trip it eliminates dominates.
    """
    impl = impl or "dense"
    if impl == "flash" and jax.default_backend() == "tpu":
        # training-fused library kernel; off-TPU falls through to the XLA
        # path (same math — parity is asserted on-chip)
        return _train_flash_attention(q, k, v, kv_mask)
    if impl == "fused":
        from .flash_attention import flash_attention, supported

        if supported(q.shape, k.shape):
            B, Tk = k.shape[0], k.shape[1]
            km = kv_mask if kv_mask is not None else jnp.ones((B, Tk))
            return flash_attention(q, k, v, km)

    pair = None
    if q_mask is not None or kv_mask is not None:
        B, Tq = q.shape[:2]
        Tk = k.shape[1]
        qm = q_mask if q_mask is not None else jnp.ones((B, Tq))
        km = kv_mask if kv_mask is not None else jnp.ones((B, Tk))
        pair = qm[:, :, None] * km[:, None, :]
    return dense_attention(q, k, v, pair_mask=pair)
