"""Residual vector quantization (RVQ) for the neural codec.

TPU-native implementation of the quantizer the reference consumes through
the ``encodec`` dependency (``vall_e/emb/qnt.py:18-69``): a stack of
Euclidean codebooks applied to the residual, 1024 codes each; at 6 kbps /
24 kHz eight codebooks are active — the source of the 8 RVQ levels the
whole TTS stack is built around.

Everything is expressed as dense matmul/argmin over (B·T, D) blocks — MXU
shaped — with no per-step host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def nearest_code(x: jax.Array, codebook: jax.Array) -> jax.Array:
    """Nearest-neighbour code ids.

    x: (..., D); codebook: (K, D) → (...,) int32.
    Distance: |x|² − 2·x·E + |E|²; |x|² is constant in the argmin so only
    the cross term and code norms are computed (one matmul on the MXU).
    """
    dots = jnp.einsum(
        "...d,kd->...k", x, codebook, preferred_element_type=jnp.float32
    )
    code_sq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)
    return jnp.argmin(code_sq - 2.0 * dots, axis=-1).astype(jnp.int32)


class ResidualVQ(nn.Module):
    """Residual VQ: quantize, subtract, repeat (≡ encodec RVQ semantics).

    ``n_q`` total codebooks; encode/decode take ``num_quantizers`` ≤ n_q to
    select the active bandwidth (8 at 6 kbps).
    """

    n_q: int = 32
    bins: int = 1024
    dim: int = 128

    def setup(self):
        self.codebooks = self.param(
            "codebooks",
            nn.initializers.normal(1.0),
            (self.n_q, self.bins, self.dim),
        )

    def encode(self, x: jax.Array, num_quantizers: int) -> jax.Array:
        """x: (B, T, D) latents → codes (B, num_quantizers, T) int32."""
        residual = x.astype(jnp.float32)
        codes = []
        for q in range(num_quantizers):
            idx = nearest_code(residual, self.codebooks[q])
            quantized = self.codebooks[q][idx]
            residual = residual - quantized
            codes.append(idx)
        return jnp.stack(codes, axis=1)

    def decode(self, codes: jax.Array) -> jax.Array:
        """codes: (B, Q, T) int32 → latents (B, T, D)."""
        Q = codes.shape[1]
        out = jnp.zeros((*codes.shape[::2], self.dim), jnp.float32)  # (B, T, D)
        for q in range(Q):
            out = out + self.codebooks[q][codes[:, q]]
        return out

    def __call__(self, x: jax.Array, num_quantizers: int):
        codes = self.encode(x, num_quantizers)
        return self.decode(codes), codes
