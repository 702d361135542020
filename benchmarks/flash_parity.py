#!/usr/bin/env python
"""On-chip parity check: `impl="flash"` (fully-fused library Pallas kernel)
vs the dense XLA path, forward AND gradients, at DiT training shapes.

The CPU suite can only assert the off-TPU fallback (tests/test_pallas_ops.py);
this script is the TPU leg — run it once after touching ops/attention.py:

    python benchmarks/flash_parity.py [--resp-len 192] [--batch 8]

Prints one JSON line with max abs errors; exits non-zero on mismatch.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--resp-len", type=int, default=192)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--d-head", type=int, default=64)
    # bf16 QKV like the training path; fp32 comparison threshold scaled
    # accordingly (softmax in fp32 both sides).
    ap.add_argument("--atol", type=float, default=2e-2)
    ap.add_argument("--causal", action="store_true",
                    help="packed-backbone mode: a [text|sep|prom|sep|resp] "
                         "mask with tail pads per segment; compares the "
                         "kernel's slot-causality + segment ids against the "
                         "exact pos-causal dense mask (models/base.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tts_with_diffusion_model_tpu.ops.attention import (
        _train_flash_attention,
        cross_attention,
        dense_attention,
    )

    assert jax.default_backend() == "tpu", "parity leg needs the chip"

    B, T, H, Dh = args.batch, args.resp_len, args.heads, args.d_head
    r = jax.random.split(jax.random.PRNGKey(0), 4)

    if args.causal:
        # packed layout with tail pads per segment (models/base.py
        # packed_layout): text | sep | prom | sep | resp, random valid
        # lengths per sample
        from tts_with_diffusion_model_tpu.models.base import packed_layout

        Tt, Tp, Tr = 12, 48, T
        def seg_mask(key, n, lo):
            lens = jax.random.randint(key, (B,), lo, n + 1)
            return (jnp.arange(n)[None] < lens[:, None]).astype(jnp.float32)
        km = jax.random.split(r[3], 3)
        mask, pos, _ = packed_layout(
            seg_mask(km[0], Tt, 3), seg_mask(km[1], Tp, 8),
            seg_mask(km[2], Tr, 16),
        )
        T = mask.shape[1]
    else:
        mask = (jax.random.uniform(r[3], (B, T)) > 0.25).astype(jnp.float32)
        mask = mask.at[:, 0].set(1.0)
        pos = None

    q = jax.random.normal(r[0], (B, T, H, Dh), jnp.bfloat16)
    k = jax.random.normal(r[1], (B, T, H, Dh), jnp.bfloat16)
    v = jax.random.normal(r[2], (B, T, H, Dh), jnp.bfloat16)

    def run(impl):
        def loss(q, k, v):
            if args.causal:
                if impl == "flash":
                    o = _train_flash_attention(q, k, v, mask, causal=True)
                else:
                    pair = mask[:, :, None] * mask[:, None, :]
                    pair = pair * (
                        pos[:, None, :] <= pos[:, :, None]
                    ).astype(pair.dtype)
                    o = dense_attention(q, k, v, pair_mask=pair)
            else:
                o = cross_attention(
                    q, k, v, q_mask=mask, kv_mask=mask, impl=impl
                )
            # mask query rows like the callers do (x * m / to_out * mask)
            # before reducing: flash drops query-side masking by design.
            o = o * mask[..., None, None].astype(o.dtype)
            return (o.astype(jnp.float32) ** 2).sum()

        f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
        val, grads = f(q, k, v)
        return float(val), [np.asarray(g, np.float32) for g in grads]

    v_dense, g_dense = run("dense")
    v_flash, g_flash = run("flash")

    rel_val = abs(v_flash - v_dense) / max(abs(v_dense), 1e-9)
    errs = [float(np.max(np.abs(a - b))) / max(float(np.max(np.abs(b))), 1e-9)
            for a, b in zip(g_flash, g_dense)]
    out = {
        "mode": "packed-causal" if args.causal else "bidir",
        "shape": [B, T, H, Dh],
        "loss_dense": v_dense,
        "loss_flash": v_flash,
        "rel_loss_err": rel_val,
        "rel_grad_err_qkv": [round(e, 5) for e in errs],
        "ok": bool(rel_val < args.atol and max(errs) < args.atol),
    }
    print(json.dumps(out))
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
