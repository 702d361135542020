"""Pallas fused attention kernel for TPU, tuned for the serving shapes.

The backbone's hot op (``vall_e/vall_e/base.py:113-127`` computes dense
masked attention; the DiT blocks use ``nn.MultiheadAttention``).  XLA
cannot fuse matmul → softmax → matmul into one kernel, so the (B, H, T, T)
score tensor round-trips through HBM.  This kernel keeps scores in VMEM,
and — unlike a textbook flash layout — is shaped for this workload's
*small-batch, short-sequence* regime (B ≤ 8, T ≤ 448, D = 512):

  - **No layout transposes.**  Inputs stay (B, T, H, Dh); one program per
    batch element DMAs the contiguous (T, H·Dh) slab and loops over heads
    in-register.  The previous design's (B,T,H,D)→(B,H,T,D) ``moveaxis`` on
    q/k/v/out cost four extra HBM round trips per call — more than the
    fusion saved at these sizes.
  - **Vector masks.**  Query/key validity comes in as (B, T) vectors and the
    pair mask is formed in VMEM, instead of materializing a (B, Tq, Tk)
    mask in HBM per call.
  - Whole-sequence tiles: a 448² fp32 score tile is 0.8 MB, well inside the
    ~16 MB VMEM budget, so no online-softmax streaming is needed
    (T ≤ ``MAX_FUSED_SEQ`` enforced by ``supported``).

Semantics match ``dense_attention`` with ``pair = qm ⊗ km`` at every valid
query position; fully-masked (padding) query rows differ only in garbage
that every caller multiplies away.  The backward pass recomputes through
the XLA reference path (``jax.custom_vjp``), so the kernel is safe under
autodiff anywhere in the model.

Falls back to the XLA path off-TPU (CPU tests run the same math through
``dense_attention``; ``interpret=True`` covers kernel-level tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# Whole-sequence tiles stay comfortably in VMEM up to this length.
MAX_FUSED_SEQ = 1024


def _attn_kernel(q_ref, k_ref, v_ref, km_ref, o_ref, *, scale: float, n_heads: int):
    km = km_ref[0, 0]  # (Tk,)
    key_bias = jnp.where(km > 0, 0.0, NEG_INF)[None, :]  # (1, Tk)
    for h in range(n_heads):  # static unroll: all heads share one DMA'd slab
        # native-dtype operands (bf16 in → fp32 accumulate on the MXU; an
        # fp32 upcast before the dot would quarter the MXU rate)
        q = q_ref[0, :, h, :]  # (Tq, Dh)
        k = k_ref[0, :, h, :]  # (Tk, Dh)
        v = v_ref[0, :, h, :]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s + key_bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h, :] = o.astype(o_ref.dtype)


def _flash_impl(q, k, v, kv_mask, interpret=False):
    B, Tq, H, Dh = q.shape
    Tk = k.shape[1]
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=Dh**-0.5, n_heads=H),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Tq, H, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, H, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, H, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, Tk) so the per-batch block (1, 1, Tk) satisfies the
            # TPU tiling rule (trailing block dims must equal the array's).
            pl.BlockSpec((1, 1, Tk), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tq, H, Dh), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tq, H, Dh), v.dtype),
        interpret=interpret,
    )(q, k, v, kv_mask.astype(jnp.float32)[:, None, :])


def _dense_ref(q, k, v, kv_mask):
    """XLA reference with the same key-mask semantics (backward path)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    s = jnp.where(kv_mask[:, None, None, :].astype(bool), s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhij,bjhd->bihd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(q, k, v, kv_mask, interpret=False):
    """Fused masked attention.

    q: (B, Tq, H, Dh); k, v: (B, Tk, H, Dh); kv_mask: (B, Tk) key validity.
    Returns (B, Tq, H, Dh).  Query-side masking is the caller's business
    (every call site multiplies activations by the query mask anyway).
    """
    return _flash_impl(q, k, v, kv_mask, interpret)


def _flash_fwd(q, k, v, kv_mask, interpret):
    return _flash_impl(q, k, v, kv_mask, interpret), (q, k, v, kv_mask)


def _flash_bwd(interpret, res, g):
    q, k, v, kv_mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _dense_ref(q_, k_, v_, kv_mask), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def supported(q_shape, k_shape) -> bool:
    """Shapes the fused whole-sequence kernel handles."""
    _, Tq, H, Dh = q_shape
    Tk = k_shape[1]
    # bound the per-program VMEM slab: q/k/v/o + one (Tq, Tk) score tile
    slab_bytes = (2 * Tq + 2 * Tk) * H * Dh * 4 + Tq * Tk * 4
    return (
        Tq <= MAX_FUSED_SEQ
        and Tk <= MAX_FUSED_SEQ
        and Dh % 8 == 0
        and slab_bytes < 12 * 1024 * 1024
    )
