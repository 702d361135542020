"""Inference precision helpers.

``cast_params_bf16``: cast weight matrices/embeddings to bf16 for serving
(activations are already bf16; halving parameter bytes roughly halves the
HBM-bandwidth-bound per-token decode cost).  Norm/scale/bias parameters and
anything 1-D stay fp32 — they are tiny and precision-sensitive.  Training
keeps fp32 masters (SURVEY §2.2 mixed-precision plan).
"""

from __future__ import annotations

import jax.numpy as jnp


def cast_params_bf16(params):
    from flax import linen as nn

    params = nn.meta.unbox(params)

    def cast(path, leaf):
        name = path[-1] if path else ""
        if getattr(leaf, "ndim", 0) <= 1:
            return leaf  # biases, norms, schedules
        if "norm" in ".".join(str(p) for p in path).lower():
            return leaf
        return leaf.astype(jnp.bfloat16)

    def rec(node, path):
        if isinstance(node, dict):
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        return cast(path, node)

    return rec(params, ())
