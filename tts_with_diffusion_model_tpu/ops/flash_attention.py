"""Pallas fused attention kernel for TPU.

The backbone's hot op (``vall_e/vall_e/base.py:113-127`` computes dense
masked attention; the DiT blocks use ``nn.MultiheadAttention``).  XLA
cannot fuse matmul → softmax → matmul into one kernel, so the (B, H, T, T)
score tensor round-trips through HBM; this kernel keeps scores in VMEM —
one program per (batch, head) computes ``softmax(QKᵀ·s + mask)·V`` for the
whole sequence (T ≤ ~1k here: a 448² fp32 score tile is 0.8 MB, well inside
the ~16 MB VMEM budget, so no online-softmax streaming is needed).

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


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)  # (Tq, Dh)
    k = k_ref[0, 0].astype(jnp.float32)  # (Tk, Dh)
    v = v_ref[0, 0]                      # (Tk, Dh)
    m = mask_ref[0]                      # (Tq, Tk)

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = jnp.where(m > 0, s, NEG_INF)
    # numerically-stable softmax in VMEM
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jax.Array,      # (B, T, H, Dh)
    k: jax.Array,
    v: jax.Array,
    pair_mask: jax.Array,  # (B, Tq, Tk), 1 = attend
    interpret: bool = False,
) -> jax.Array:
    """Fused masked attention; same contract as ``dense_attention``."""
    B, Tq, H, Dh = q.shape
    Tk = k.shape[1]
    scale = Dh**-0.5

    qt = jnp.moveaxis(q, 2, 1)  # (B, H, T, Dh)
    kt = jnp.moveaxis(k, 2, 1)
    vt = jnp.moveaxis(v, 2, 1)
    mask = pair_mask.astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, Tq, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tq, Tk), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Tq, Dh), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, Dh), v.dtype),
        interpret=interpret,
    )(qt, kt, vt, mask)
    return jnp.moveaxis(out, 1, 2)  # back to (B, T, H, Dh)


def supported(q_shape, k_shape) -> bool:
    """Shapes the fused whole-sequence kernel handles."""
    _, Tq, _, Dh = q_shape
    Tk = k_shape[1]
    return Tq <= MAX_FUSED_SEQ and Tk <= MAX_FUSED_SEQ and Dh % 8 == 0
