"""DiT-style denoiser for the D3PM codec-token diffusion model.

TPU-native rebuild of the denoiser inside ``vall_e/vall_e/ar_discrete.py``:
  - two conditioning towers (2-layer transformer encoder + SiLU MLP) for the
    speaker prompt (MultiEmbedding over 8 RVQ levels) and the text phonemes
    (``ar_discrete.py:216-230``),
  - a learned timestep embedding (``:213``),
  - N DiT blocks, each = self-attention + cross-attention(text) +
    cross-attention(speaker) + FiLM timestep modulation + MLP
    (``:98-161``), and
  - a linear head to ``n_classes`` logits (``:240``).

Intent-preserving fixes (documented deviations):
  - the reference's ``DiTBlock`` defines a second cross-attention
    (``cross_attn2``) but mistakenly reuses ``cross_attn`` for the speaker
    path (``:142``); here the speaker path gets its own parameters.
  - the reference hard-codes ``d_model = 32`` inside ``__init__`` (``:208``),
    overriding the 512 passed by ``get_model("diffusion")``
    (``vall_e/vall_e/__init__.py:23-31``); here ``d_model`` is honored.
  - conditioning towers are batched (the reference conditions every sample
    on batch element 0's prompt, ``:631-638``).
  - attention masks: pads are excluded as keys (the reference zeroes padded
    embeddings but lets attention mix them).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import cross_attention, dense_attention
from .base import (
    EMBED,
    HEADS,
    MLP,
    VOCAB,
    MultiEmbedding,
    resolve_remat_policy,
    sinusoidal_embedding,
)


class Mlp(nn.Module):
    """timm-style MLP (in → hidden → out) used throughout the denoiser.

    Activations match their torch counterparts exactly ("gelu" = erf-form
    ``nn.GELU``, "relu" = ``TransformerEncoderLayer``'s default)."""

    hidden: int
    out: int
    act: str = "gelu"
    #: compute dtype for the projections (params stay fp32 masters; flax
    #: casts both operands to ``dtype`` inside the matmul).  ``None`` keeps
    #: promotion semantics — fp32 compute whenever params are fp32.
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(
            self.hidden,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), (EMBED, MLP)
            ),
            dtype=self.dtype,
            name="fc1",
        )(x)
        if self.act == "silu":
            h = nn.silu(h)
        elif self.act == "relu":
            h = nn.relu(h)
        else:
            h = nn.gelu(h, approximate=False)
        h = nn.Dense(
            self.out,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), (MLP, EMBED)
            ),
            dtype=self.dtype,
            name="fc2",
        )(h)
        return h


class MHA(nn.Module):
    """Projection + dense attention, mirroring ``nn.MultiheadAttention``.

    ``kv()`` exposes the key/value projections separately so constant
    conditioning K/V can be computed once and reused across all diffusion
    timesteps (the reference recomputes them inside the timestep loop)."""

    d_model: int
    n_heads: int
    dtype: Any = None
    #: attention implementation (ops/attention.py cross_attention ``impl``):
    #: None/"dense" = XLA, "fused" = the repo's forward-fused Pallas kernel,
    #: "flash" = the fully-fused (fwd+bwd) library Pallas kernel — the
    #: training-time HBM lever; off-TPU it falls back to dense.
    attn_impl: str | None = None

    def setup(self):
        init = nn.with_logical_partitioning(
            nn.initializers.lecun_normal(), (EMBED, HEADS)
        )
        out_init = nn.with_logical_partitioning(
            nn.initializers.lecun_normal(), (HEADS, EMBED)
        )
        self.q = nn.Dense(self.d_model, kernel_init=init, dtype=self.dtype)
        self.k = nn.Dense(self.d_model, kernel_init=init, dtype=self.dtype)
        self.v = nn.Dense(self.d_model, kernel_init=init, dtype=self.dtype)
        self.out = nn.Dense(
            self.d_model, kernel_init=out_init, dtype=self.dtype
        )

    def _heads(self, t):
        return t.reshape(*t.shape[:-1], self.n_heads, self.d_model // self.n_heads)

    def kv(self, kv_in):
        return self._heads(self.k(kv_in)), self._heads(self.v(kv_in))

    def attend(self, q_in, k, v, q_mask=None, kv_mask=None):
        q = self._heads(self.q(q_in))
        o = cross_attention(q, k, v, q_mask, kv_mask, impl=self.attn_impl)
        o = o.reshape(*o.shape[:-2], self.d_model)
        return self.out(o)

    def __call__(self, q_in, kv_in, q_mask=None, kv_mask=None):
        k, v = self.kv(kv_in)
        return self.attend(q_in, k, v, q_mask, kv_mask)


class EncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (torch ``TransformerEncoderLayer``
    semantics, used by the conditioning towers, ``ar_discrete.py:216-230``).

    ``ffn_dim=None`` → 4·d_model (the production default; equals torch's
    dim_feedforward=2048 at d_model=512).  ``act="relu"`` + ``ffn_dim=2048``
    reproduce ``TransformerEncoderLayer`` defaults exactly (oracle parity);
    LN eps 1e-5 matches torch."""

    d_model: int
    n_heads: int
    ffn_dim: int | None = None
    act: str = "gelu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None):
        h = MHA(self.d_model, self.n_heads, dtype=self.dtype,
                name="self_attn")(x, x, mask, mask)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + h)
        ffn = self.ffn_dim if self.ffn_dim is not None else self.d_model * 4
        h = Mlp(ffn, self.d_model, act=self.act, dtype=self.dtype,
                name="ffn")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)
        return x


class CondTower(nn.Module):
    """2-layer encoder + SiLU MLP conditioning tower (``ar_discrete.py:216-230``)."""

    d_model: int
    n_heads: int
    mlp_mult: int
    n_layers: int = 2
    ffn_dim: int | None = None
    act: str = "gelu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None):
        for i in range(self.n_layers):
            x = EncoderLayer(
                self.d_model, self.n_heads, self.ffn_dim, self.act,
                dtype=self.dtype, name=f"layer_{i}",
            )(x, mask)
        x = Mlp(self.d_model * self.mlp_mult, self.d_model, act="silu",
                dtype=self.dtype, name="mlp")(x)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        return x


class DiTBlock(nn.Module):
    """Self-attn + dual cross-attn + FiLM(t) + MLP (≡ ``ar_discrete.py:98-161``).

    ``cross_kv`` precomputes the (constant) conditioning K/V once; the
    per-timestep ``apply_step`` consumes them — hoisting 4 projection
    matmuls per block out of the 99-step reverse loop."""

    d_model: int
    n_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = None
    #: attention impl for the *self*-attention (the (B, H, Tr, Tr) score
    #: tensor — the block's dominant HBM traffic at train batch sizes).
    #: Cross-attention stays dense: its key sides (text 50, prom 398) keep
    #: scores small and the flash kernel's 128-multiple padding would cost
    #: more than the fusion saves.
    attn_impl: str | None = None

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=1e-6)
        self.attn = MHA(self.d_model, self.n_heads, dtype=self.dtype,
                        attn_impl=self.attn_impl)
        self.norm2 = nn.LayerNorm(epsilon=1e-6)
        self.cross_attn = MHA(self.d_model, self.n_heads, dtype=self.dtype)
        self.norm22 = nn.LayerNorm(epsilon=1e-6)
        self.cross_attn2 = MHA(self.d_model, self.n_heads, dtype=self.dtype)
        self.norm3 = nn.LayerNorm(epsilon=1e-6)
        self.mlp = Mlp(int(self.d_model * self.mlp_ratio), self.d_model,
                       dtype=self.dtype)
        self.timestep_fc = nn.Dense(
            self.d_model * 2,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.zeros, (EMBED, MLP)
            ),
            dtype=self.dtype,
        )

    def cross_kv(self, text_cond, spkr_cond):
        return self.cross_attn.kv(text_cond), self.cross_attn2.kv(spkr_cond)

    def apply_step(self, x, mask, kv_text, text_mask, kv_spkr, spkr_mask, t_emb):
        m = mask[..., None].astype(x.dtype)
        x = x * m

        h = self.norm1(x)
        x = x + self.attn(h, h, mask, mask)

        h = self.norm2(x)
        ct = self.cross_attn.attend(h, *kv_text, mask, text_mask)
        h2 = self.norm22(x)
        cs = self.cross_attn2.attend(h2, *kv_spkr, mask, spkr_mask)
        x = x + ct + cs

        # FiLM timestep modulation (``ar_discrete.py:145-156``)
        ss = self.timestep_fc(t_emb)
        scale, shift = jnp.split(ss[:, None, :], 2, axis=-1)
        h = self.norm3(x)
        h = h * (1 + scale) + shift
        x = x + self.mlp(h)
        return x * m

    def __call__(self, x, mask, text_cond, text_mask, spkr_cond, spkr_mask, t_emb):
        kv_text, kv_spkr = self.cross_kv(text_cond, spkr_cond)
        return self.apply_step(
            x, mask, kv_text, text_mask, kv_spkr, spkr_mask, t_emb
        )


class DiTDenoiser(nn.Module):
    """The full denoiser: conds + N DiT blocks + logits head.

    Forward signature is x_0-prediction: given noisy level-0 tokens ``x_t``
    and the timestep, produce logits over the ``n_classes`` token vocabulary
    (1024 codec codes + absorbing state).
    """

    n_classes: int = 1025
    d_model: int = 512
    n_heads: int = 8
    n_layers: int = 8
    n_prom_levels: int = 8
    timesteps: int = 100
    dtype: Any = jnp.bfloat16
    # Reference-parity knobs (tests/test_reference_oracle.py): tower FFN
    # width/activation (torch TransformerEncoderLayer defaults are 2048/relu)
    # and whether the noisy response sequence gets positional encoding (the
    # reference leaves its ``sin_emb2`` unused — see ``denoise`` docstring).
    tower_ffn_dim: int | None = None
    tower_act: str = "gelu"
    resp_pe: bool = True
    # Per-block gradient checkpointing (≡ the reference backbone's
    # ``poor_in_vram`` rematerialization, ``base.py:228-232``): backward
    # recomputes each DiT block instead of storing its activations —
    # trades ~1 extra forward for O(1-block) activation memory, lifting the
    # trainable batch ceiling (B=96 OOMs without it).  Forward-only paths
    # (sampling) are unaffected: ``jax.checkpoint`` is inert without
    # differentiation.
    remat: bool = False
    #: rematerialization policy (only meaningful with ``remat=True``):
    #: ``None`` recomputes the whole block; ``"dots"`` saves every matmul
    #: output and recomputes only the cheap elementwise/attention-softmax
    #: work between them (``jax.checkpoint_policies``) — less recompute for
    #: a modest activation-memory increase.  See resolve_remat_policy.
    remat_policy: Optional[str] = None
    #: self-attention implementation inside the DiT blocks (see DiTBlock /
    #: ops/attention.py): "flash" routes training through the fully-fused
    #: library Pallas kernel on TPU.
    attn_impl: Optional[str] = None

    def setup(self):
        self.text_emb = nn.Embed(
            self.n_classes,
            self.d_model,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(1.0), (VOCAB, EMBED)
            ),
        )
        self.proms_emb = MultiEmbedding(
            self.n_prom_levels, self.n_classes, self.d_model
        )
        self.resps_emb = nn.Embed(
            self.n_classes,
            self.d_model,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(1.0), (VOCAB, EMBED)
            ),
        )
        self.time_emb = nn.Embed(self.timesteps + 1, self.d_model)
        self.text_tower = CondTower(
            self.d_model, self.n_heads, mlp_mult=2,
            ffn_dim=self.tower_ffn_dim, act=self.tower_act,
            dtype=self.dtype,
        )
        self.prom_tower = CondTower(
            self.d_model, self.n_heads, mlp_mult=3,
            ffn_dim=self.tower_ffn_dim, act=self.tower_act,
            dtype=self.dtype,
        )
        Block = (
            nn.remat(
                DiTBlock,
                methods=("apply_step",),
                policy=resolve_remat_policy(self.remat_policy),
            )
            if self.remat
            else DiTBlock
        )
        self.blocks = [
            Block(self.d_model, self.n_heads, dtype=self.dtype,
                  attn_impl=self.attn_impl, name=f"dit_{i}")
            for i in range(self.n_layers)
        ]
        self.final = nn.Dense(
            self.n_classes,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), (EMBED, VOCAB)
            ),
            dtype=jnp.float32,
        )

    def conds(self, text, text_mask, proms, prom_mask):
        """Compute conditioning once per utterance (hoisted out of the
        timestep loop, unlike the reference's training forward)."""
        B, Tt = text.shape
        Tp = proms.shape[1]
        te = self.text_emb(text) + sinusoidal_embedding(
            jnp.arange(Tt)[None], self.d_model
        )
        pe = self.proms_emb(proms) + sinusoidal_embedding(
            jnp.arange(Tp)[None], self.d_model
        )
        te = te.astype(self.dtype) * text_mask[..., None].astype(self.dtype)
        pe = pe.astype(self.dtype) * prom_mask[..., None].astype(self.dtype)
        text_cond = self.text_tower(te, text_mask)
        spkr_cond = self.prom_tower(pe, prom_mask)
        return text_cond, spkr_cond

    def cond_kv(self, text_cond, spkr_cond):
        """Per-block cross-attention K/V of the (timestep-constant)
        conditioning — computed once per utterance, reused by every reverse
        step (the reference recomputes these inside the loop)."""
        return [block.cross_kv(text_cond, spkr_cond) for block in self.blocks]

    def denoise_with_kv(self, x_t, resp_mask, t, kv_list, text_mask, prom_mask):
        """One denoiser evaluation with precomputed conditioning K/V."""
        x = self.resps_emb(x_t)
        if self.resp_pe:
            x = x + sinusoidal_embedding(
                jnp.arange(x_t.shape[1])[None], self.d_model
            )
        x = x.astype(self.dtype)
        x = x * resp_mask[..., None].astype(self.dtype)
        t_emb = self.time_emb(t).astype(self.dtype)
        for block, (kv_text, kv_spkr) in zip(self.blocks, kv_list):
            x = block.apply_step(
                x, resp_mask, kv_text, text_mask, kv_spkr, prom_mask, t_emb
            )
        logits = self.final(x.astype(jnp.float32))
        return logits * resp_mask[..., None]

    def denoise(self, x_t, resp_mask, t, text_cond, text_mask, spkr_cond, prom_mask):
        """One denoiser evaluation.  x_t: (B, Tr) ints; t: (B,).
        Returns x_0 logits (B, Tr, n_classes) in fp32.

        Positional encoding on the noisy sequence is required: from the
        all-absorbing start state every position is otherwise identical and
        the denoiser cannot align tokens to the text (the reference defines
        ``sin_emb2`` for exactly this but leaves its ``add_pe`` call
        commented out, ``ar_discrete.py:233, 657`` — an intent fix)."""
        kv_list = self.cond_kv(text_cond, spkr_cond)
        return self.denoise_with_kv(
            x_t, resp_mask, t, kv_list, text_mask, prom_mask
        )

    def __call__(self, text, text_mask, proms, prom_mask, x_t, resp_mask, t):
        text_cond, spkr_cond = self.conds(text, text_mask, proms, prom_mask)
        return self.denoise(
            x_t, resp_mask, t, text_cond, text_mask, spkr_cond, prom_mask
        )
