"""Shared VALL-E backbone, TPU-native.

Re-design of the reference backbone (``vall_e/vall_e/base.py:289-499``) for
XLA: the reference operates on ragged per-sample lists packed as
``text ⧺ <sep> ⧺ proms ⧺ <sep> ⧺ resps`` and padded per batch; here every
batch is a set of **static-shape segment slots**

    [ text (Tt) | sep | proms (Tp) | sep | resps (Tr) ]

with per-segment validity masks.  Packed-sequence semantics are recovered
exactly by computing *packed position ids* as ``cumsum(mask) - 1`` over slot
order: the positions feed the sinusoidal PE and the causal order, so a
sequence with mid-layout padding is numerically identical to the reference's
contiguous packing (invalid slots are masked out of attention keys/outputs
and of the loss).  Static shapes mean one XLA compilation per bucket and
MXU-friendly dense attention.

Key correspondences to the reference:
  - ``MultiEmbedding`` (one-hot × weight einsum, ``base.py:244-274``) →
    gather + masked level-sum (same math, no (T, L, 1025) one-hots).
  - ``Attention`` (einsum + -finfo.max fill, ``base.py:92-133``) → dense
    attention over packed positions with fp32 softmax, plus an incremental
    KV-cache decode path the reference lacks (it recomputes the full prefix
    per generated token, ``ar.py:155-166``) — same distribution, far faster.
  - ``AdaLN`` AdaNorm trick ``c·(1−k·sg(h))·h`` (``base.py:136-158``) kept.
  - loss layout (``base.py:445-488``): targets built per segment with
    ignore-index −100; AR shifts over packed order.  One deliberate fix over
    the reference: the sep position immediately before the responses is
    trained to predict the first response token (the reference leaves it
    untrained yet *samples* from it at the first generation step).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import _train_flash_attention, dense_attention

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
IGNORE_INDEX = -100

# Logical axis names used for pjit/tensor-parallel sharding.  Mapped onto the
# physical mesh in ``parallel/mesh.py`` ("embed" stays replicated;
# "heads"/"mlp"/"vocab" shard over the model ("tp") axis).
EMBED = "embed"
HEADS = "heads"
MLP = "mlp"
VOCAB = "vocab"


def resolve_remat_policy(name: Optional[str]):
    """Map a config string to a ``jax.checkpoint_policies`` policy.

    ``None`` → full recompute (classic per-block remat); ``"dots"`` saves
    every matmul result that has no batch dims (all Dense projections —
    attention's QKᵀ/AV keep their (B, heads) batch dims and are recomputed,
    which is exactly the O(T²) memory remat exists to shed); ``"dots_all"``
    saves every matmul including attention scores (memory ≈ no-remat).
    Gradients are bit-identical across policies; only the recompute/memory
    trade moves (tests/test_compute_dtype.py pins this).
    """
    if name is None:
        return None
    table = {
        "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "dots_all": jax.checkpoint_policies.dots_saveable,
        "nothing": jax.checkpoint_policies.nothing_saveable,
    }
    if name not in table:
        raise ValueError(
            f"unknown remat policy {name!r}; one of {sorted(table)}")
    return table[name]


def sinusoidal_embedding(pos: jax.Array, d_model: int) -> jax.Array:
    """Sinusoidal features of positions/timesteps.

    Matches the reference's ``SinusodialEmbedding`` layout (``base.py:38-89``):
    ``[sin(ω_i·x) ‖ cos(ω_i·x)]`` with ``ω_i = exp(-ln(1e4) · i/(d/2))``.
    """
    d_half = d_model // 2
    exponent = jnp.arange(d_half, dtype=jnp.float32) / d_half
    omega = jnp.exp(-math.log(1e4) * exponent)
    x = pos.astype(jnp.float32)[..., None] * omega
    return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)


class MultiEmbedding(nn.Module):
    """Sum of per-RVQ-level embeddings (≡ ``base.py:244-274``).

    ``tokens``: (..., T, L) int32; ``level_mask``: (..., L) float — which
    levels actually contribute (the NAR feeds a per-sample prefix of levels).
    Output: (..., T, D).
    """

    max_n_levels: int
    n_tokens: int
    token_dim: int

    def setup(self):
        self.weight = self.param(
            "weight",
            nn.with_logical_partitioning(
                nn.initializers.normal(1.0), (None, VOCAB, EMBED)
            ),
            (self.max_n_levels, self.n_tokens, self.token_dim),
        )

    def __call__(self, tokens: jax.Array, level_mask: jax.Array | None = None):
        lvl = jnp.arange(self.max_n_levels)
        # (..., T, L, D): per-level gather, then masked sum over levels.
        emb = self.weight[lvl[None, None, :], tokens]
        if level_mask is not None:
            while level_mask.ndim < emb.ndim - 1:
                level_mask = level_mask[..., None, :]
            emb = emb * level_mask[..., None].astype(emb.dtype)
        return emb.sum(axis=-2)


def _layer_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Parameter-free LN in fp32 (the reference's F.layer_norm sans affine)."""
    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class AdaLN(nn.Module):
    """Level-conditioned norm with the AdaNorm trick (``base.py:136-158``)."""

    d_model: int
    n_levels: int
    eps: float = 1e-5
    k: float = 0.1
    c: float = 2.0

    def setup(self):
        self.emb = self.param(
            "emb",
            nn.with_logical_partitioning(nn.initializers.zeros, (None, EMBED)),
            (self.n_levels, self.d_model * 2),
        )

    def __call__(self, x: jax.Array, level: jax.Array):
        params = self.emb[level]  # (B, 2D)
        log_gamma, beta = jnp.split(params[:, None, :], 2, axis=-1)
        h = _layer_norm(x, self.eps)
        h = self.c * (1 - jax.lax.stop_gradient(self.k * h)) * h
        return (jnp.exp(log_gamma) * h + beta).astype(x.dtype)


class Attention(nn.Module):
    """Multi-head attention over packed positions (≡ ``base.py:92-133``),
    with an incremental KV-cache decode path."""

    d_model: int
    n_heads: int
    causal: bool
    #: compute dtype for projections (fp32 master params are cast inside
    #: the matmul; ``None`` keeps promotion semantics = fp32 compute).
    dtype: Any = None
    #: "flash" routes the batch path through the fully-fused library Pallas
    #: kernel on TPU (ops/attention.py _train_flash_attention) — the
    #: (B, H, T, T) score tensor never touches HBM in either pass, the
    #: dominant training cost at packed T≈1.2k.  Decode paths are
    #: unaffected (single-query shapes don't profit).  Off-TPU: dense.
    attn_impl: str | None = None

    def setup(self):
        self.to_qkv = nn.Dense(
            3 * self.d_model,
            use_bias=False,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), (EMBED, HEADS)
            ),
            dtype=self.dtype,
        )
        self.to_out = nn.Dense(
            self.d_model,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), (HEADS, EMBED)
            ),
            dtype=self.dtype,
        )

    def _heads(self, t):
        return t.reshape(*t.shape[:-1], self.n_heads, self.d_model // self.n_heads)

    def __call__(self, x, mask, pos, return_kv: bool = False):
        """Batch mode. x: (B, T, D); mask: (B, T); pos: (B, T)."""
        q, k, v = jnp.split(self.to_qkv(x), 3, axis=-1)
        q, k, v = self._heads(q), self._heads(k), self._heads(v)

        if self.attn_impl == "flash" and jax.default_backend() == "tpu":
            # pads only occur at segment tails, so pos-causality over valid
            # tokens ≡ the kernel's slot-causality; pad keys are excluded by
            # segment ids, pad-query garbage is zeroed by the ``* mask``
            # below (on-chip parity: benchmarks/flash_parity.py --causal)
            o = _train_flash_attention(q, k, v, mask, causal=self.causal)
        else:
            pair = mask[:, :, None] * mask[:, None, :]
            if self.causal:
                pair = pair * (
                    pos[:, None, :] <= pos[:, :, None]
                ).astype(pair.dtype)
            o = dense_attention(q, k, v, pair_mask=pair)
        o = o.reshape(*o.shape[:-2], self.d_model)
        o = self.to_out(o) * mask[..., None].astype(x.dtype)
        if return_kv:
            return o, (k, v)
        return o

    def decode_step(self, x_step, cache_k, cache_v, index, kv_mask):
        """Single-token decode. x_step: (B, 1, D); cache_{k,v}: (B, Tc, H, Dh);
        index: scalar write slot; kv_mask: (B, Tc) of valid cache entries
        (including the new one).  Returns (out (B, 1, D), cache_k, cache_v).
        """
        q, k, v = jnp.split(self.to_qkv(x_step), 3, axis=-1)
        q, k, v = self._heads(q), self._heads(k), self._heads(v)
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k, index, axis=1)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v, index, axis=1)
        pair = kv_mask[:, None, :]  # (B, 1, Tc); causality is implied: the
        # cache only contains past (+current) tokens.
        o = dense_attention(q, cache_k, cache_v, pair_mask=pair)
        o = o.reshape(*o.shape[:-2], self.d_model)
        return self.to_out(o), cache_k, cache_v

    def decode_chunk(self, x_chunk, cache_k, cache_v, index, kv_mask):
        """Multi-token cached decode (the speculative verify step).

        x_chunk: (B, W, D) teacher-forced tokens written at slots
        index..index+W-1; kv_mask: (B, Tc) valid entries incl. the W new
        ones.  Queries attend to valid cache entries at slots ≤ their own
        (causal within the chunk, everything valid before it).
        Returns (out (B, W, D), cache_k, cache_v)."""
        W = x_chunk.shape[1]
        q, k, v = jnp.split(self.to_qkv(x_chunk), 3, axis=-1)
        q, k, v = self._heads(q), self._heads(k), self._heads(v)
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k, index, axis=1)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v, index, axis=1)
        Tc = cache_k.shape[1]
        slot = jnp.arange(Tc)[None, None, :]                  # (1, 1, Tc)
        qslot = (index + jnp.arange(W))[None, :, None]        # (1, W, 1)
        pair = kv_mask[:, None, :] * (slot <= qslot).astype(kv_mask.dtype)
        o = dense_attention(q, cache_k, cache_v, pair_mask=pair)
        o = o.reshape(*o.shape[:-2], self.d_model)
        return self.to_out(o), cache_k, cache_v


class FeedForward(nn.Module):
    d_model: int
    p_dropout: float
    dtype: Any = None

    def setup(self):
        self.fc1 = nn.Dense(
            self.d_model * 4,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), (EMBED, MLP)
            ),
            dtype=self.dtype,
        )
        self.fc2 = nn.Dense(
            self.d_model,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), (MLP, EMBED)
            ),
            dtype=self.dtype,
        )
        self.drop = nn.Dropout(self.p_dropout)

    def __call__(self, x, deterministic: bool = True):
        # erf-form gelu ≡ torch nn.GELU (``base.py:211``); flax's default
        # tanh approximation differs by up to ~1e-3 per activation.
        h = nn.gelu(self.fc1(x), approximate=False)
        h = self.drop(h, deterministic=deterministic)
        return self.fc2(h)


class PrenormBlock(nn.Module):
    """Pre-norm attention + FFN residual block (≡ ``base.py:161-234``)."""

    d_model: int
    n_heads: int
    p_dropout: float
    causal: bool
    norm_type: str  # "ln" | "adaln"
    n_levels: Optional[int] = None
    dtype: Any = None
    attn_impl: Optional[str] = None

    def setup(self):
        if self.norm_type == "adaln":
            assert self.n_levels is not None
            self.norm_attn = AdaLN(self.d_model, self.n_levels)
            self.norm_ffn = AdaLN(self.d_model, self.n_levels)
        else:
            # eps 1e-5 ≡ torch nn.LayerNorm default (``base.py:176``)
            self.norm_attn = nn.LayerNorm(epsilon=1e-5)
            self.norm_ffn = nn.LayerNorm(epsilon=1e-5)
        self.attn = Attention(
            self.d_model, self.n_heads, self.causal, dtype=self.dtype,
            attn_impl=self.attn_impl,
        )
        self.ffn = FeedForward(self.d_model, self.p_dropout, dtype=self.dtype)
        self.drop = nn.Dropout(self.p_dropout)

    def _norm(self, which, x, level):
        norm = self.norm_attn if which == "attn" else self.norm_ffn
        if self.norm_type == "adaln":
            return norm(x, level)
        return norm(x)

    def __call__(self, x, mask, level, pos, deterministic: bool = True):
        m = mask[..., None].astype(x.dtype)
        h = self._norm("attn", x, level)
        h = self.attn(h * m, mask, pos)
        h = self.drop(h, deterministic=deterministic)
        x = (x + h) * m
        h = self._norm("ffn", x, level)
        h = self.ffn(h * m, deterministic)
        h = self.drop(h, deterministic=deterministic)
        x = (x + h) * m
        return x

    def prefill(self, x, mask, level, pos):
        """Batch forward that also returns this block's (k, v) for caching."""
        m = mask[..., None].astype(x.dtype)
        h = self._norm("attn", x, level)
        h, (k, v) = self.attn(h * m, mask, pos, return_kv=True)
        x = (x + h) * m
        h = self._norm("ffn", x, level)
        h = self.ffn(h * m, True)
        x = (x + h) * m
        return x, (k, v)

    def decode_step(self, x_step, cache_k, cache_v, index, kv_mask, level):
        h = self._norm("attn", x_step, level)
        h, cache_k, cache_v = self.attn.decode_step(
            h, cache_k, cache_v, index, kv_mask
        )
        x_step = x_step + h
        h = self._norm("ffn", x_step, level)
        x_step = x_step + self.ffn(h, True)
        return x_step, cache_k, cache_v

    def decode_chunk(self, x_chunk, cache_k, cache_v, index, kv_mask, level):
        h = self._norm("attn", x_chunk, level)
        h, cache_k, cache_v = self.attn.decode_chunk(
            h, cache_k, cache_v, index, kv_mask
        )
        x_chunk = x_chunk + h
        h = self._norm("ffn", x_chunk, level)
        x_chunk = x_chunk + self.ffn(h, True)
        return x_chunk, cache_k, cache_v


def packed_layout(text_mask, prom_mask, resp_mask):
    """Merged mask / packed positions / segment ids for the slot layout.

    Returns (mask, pos, segment), each (B, Tt+1+Tp+1+Tr); segment ids:
    0=text, 1=sep, 2=prom, 3=sep2, 4=resp.
    """
    B = text_mask.shape[0]
    one = jnp.ones((B, 1), dtype=text_mask.dtype)
    mask = jnp.concatenate([text_mask, one, prom_mask, one, resp_mask], axis=1)
    pos = jnp.cumsum(mask, axis=1) - 1
    seg = jnp.concatenate(
        [
            jnp.full_like(text_mask, 0),
            jnp.full_like(one, 1),
            jnp.full_like(prom_mask, 2),
            jnp.full_like(one, 3),
            jnp.full_like(resp_mask, 4),
        ],
        axis=1,
    )
    return mask, pos, seg


class Base(nn.Module):
    """The shared trunk: embeds the three segments, runs ``n_layers`` blocks,
    projects to ``n_resp_tokens`` logits (≡ ``base.py:289-440``)."""

    n_tokens: int
    d_model: int = 512
    n_heads: int = 8
    n_layers: int = 12
    p_dropout: float = 0.1
    causal: bool = False
    n_resp_levels: int = 1
    use_stop_token: bool = False
    norm_type: str = "ln"
    n_prom_levels: int = 8
    remat: bool = True
    #: see models/dit.py resolve_remat_policy ("dots" saves matmul outputs)
    remat_policy: Optional[str] = None
    #: batch-path attention impl (see Attention.attn_impl): "flash" fuses
    #: the packed self-attention fwd+bwd on TPU
    attn_impl: Optional[str] = None
    dtype: Any = jnp.bfloat16

    @property
    def n_resp_tokens(self):
        return self.n_tokens + (1 if self.use_stop_token else 0)

    @property
    def stop_token(self):
        if not self.use_stop_token:
            raise ValueError("Not using stop token!")
        return self.n_tokens

    def setup(self):
        self.text_emb = nn.Embed(
            self.n_tokens,
            self.d_model,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(1.0), (VOCAB, EMBED)
            ),
        )
        self.proms_emb = MultiEmbedding(
            self.n_prom_levels, self.n_tokens, self.d_model
        )
        self.resps_emb = MultiEmbedding(
            self.n_resp_levels, self.n_resp_tokens, self.d_model
        )
        self.sep = self.param(
            "sep",
            nn.with_logical_partitioning(nn.initializers.normal(1.0), (EMBED,)),
            (self.d_model,),
        )
        self.blocks = [
            PrenormBlock(
                self.d_model,
                self.n_heads,
                self.p_dropout,
                self.causal,
                self.norm_type,
                self.n_resp_levels,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=f"block_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.classifier = nn.Dense(
            self.n_resp_tokens,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), (EMBED, VOCAB)
            ),
            dtype=jnp.float32,
        )

    def _embed_merged(self, text, text_mask, proms, prom_mask, resps, resp_mask,
                      resp_level_mask):
        text_e = self.text_emb(text)
        proms_e = self.proms_emb(proms)
        resps_e = self.resps_emb(resps, resp_level_mask)
        B = text.shape[0]
        sep_slot = jnp.broadcast_to(self.sep, (B, 1, self.d_model))
        x = jnp.concatenate([text_e, sep_slot, proms_e, sep_slot, resps_e], axis=1)
        mask, pos, seg = packed_layout(text_mask, prom_mask, resp_mask)
        x = x + sinusoidal_embedding(pos, self.d_model)
        x = x.astype(self.dtype) * mask[..., None].astype(self.dtype)
        return x, mask, pos, seg

    def __call__(
        self,
        text: jax.Array,          # (B, Tt) int32, 0 = pad
        text_mask: jax.Array,     # (B, Tt)
        proms: jax.Array,         # (B, Tp, Lp) int32
        prom_mask: jax.Array,     # (B, Tp)
        resps: jax.Array,         # (B, Tr, Lr) int32
        resp_mask: jax.Array,     # (B, Tr)
        resp_level_mask: jax.Array | None = None,  # (B, Lr)
        quant_levels: jax.Array | None = None,     # (B,) AdaLN level ids
        deterministic: bool = True,
    ) -> jax.Array:
        """Returns logits (B, T, n_resp_tokens) over the merged layout."""
        x, mask, pos, _ = self._embed_merged(
            text, text_mask, proms, prom_mask, resps, resp_mask, resp_level_mask
        )
        B = text.shape[0]
        level = (
            quant_levels
            if quant_levels is not None
            else jnp.zeros((B,), dtype=jnp.int32)
        )
        for block in self.blocks:
            if self.remat:
                # prevent_cse must stay True (the default) outside
                # lax.scan: with it False, XLA CSEs the rematted forward
                # against the original and silently KEEPS every block
                # activation — measured on-chip at the gen4b AR shapes
                # (B=64, packed T=770, d1024/16/12): 23.5 GB at compile
                # (OOM) vs 5.9 GB with CSE prevented.
                fn = nn.remat(
                    type(block).__call__, static_argnums=(5,),
                    policy=resolve_remat_policy(self.remat_policy),
                )
                x = fn(block, x, mask, level, pos, deterministic)
            else:
                x = block(x, mask, level, pos, deterministic)
        logits = self.classifier(x.astype(jnp.float32))
        return logits * mask[..., None]

    # ---------------- incremental AR decoding ----------------

    def prefill(self, text, text_mask, proms, prom_mask, total_len: int):
        """Run the [text | sep | prom | sep] prefix, fill KV caches.

        Returns (last_logits (B, V), cache dict).  ``total_len`` is the full
        static cache length: prefix slots + max generation steps.
        """
        B, Tt = text.shape
        Tp = proms.shape[1]
        resps = jnp.zeros((B, 0, 1), dtype=jnp.int32)
        resp_mask = jnp.zeros((B, 0), dtype=text_mask.dtype)
        x, mask, pos, _ = self._embed_merged(
            text, text_mask, proms, prom_mask, resps, resp_mask, None
        )
        level = jnp.zeros((B,), dtype=jnp.int32)
        prefix_len = x.shape[1]  # Tt + 1 + Tp + 1
        n_kv_heads = self.n_heads
        d_head = self.d_model // self.n_heads

        ks, vs = [], []
        for block in self.blocks:
            x, (k, v) = block.prefill(x, mask, level, pos)
            pad = total_len - prefix_len
            k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
            ks.append(k)
            vs.append(v)

        logits = self.classifier(x.astype(jnp.float32))
        # logits at the last *valid* slot = the second sep = slot prefix_len-1
        last_logits = logits[:, prefix_len - 1, :]
        # number of valid packed positions so far, per sample
        n_valid = mask.sum(axis=1).astype(jnp.int32)  # (B,)
        cache = {
            "k": jnp.stack(ks),  # (L, B, total_len, H, Dh)
            "v": jnp.stack(vs),
            "mask": jnp.concatenate(
                [mask, jnp.zeros((B, total_len - prefix_len), mask.dtype)], axis=1
            ),
            "index": jnp.array(prefix_len, dtype=jnp.int32),
            "pos": n_valid,  # packed position of the *next* token, per sample
        }
        return last_logits, cache

    def decode_step(self, token: jax.Array, cache: dict):
        """One AR step.  token: (B,) previously sampled resp tokens.

        Returns (logits (B, V), new cache)."""
        B = token.shape[0]
        emb = self.resps_emb.weight[0, token][:, None, :]  # (B, 1, D)
        emb = emb + sinusoidal_embedding(cache["pos"][:, None], self.d_model)
        x = emb.astype(self.dtype)

        index = cache["index"]
        kv_mask = jax.lax.dynamic_update_slice_in_dim(
            cache["mask"], jnp.ones((B, 1), cache["mask"].dtype), index, axis=1
        )
        level = jnp.zeros((B,), dtype=jnp.int32)
        new_k, new_v = [], []
        for i, block in enumerate(self.blocks):
            x, ck, cv = block.decode_step(
                x, cache["k"][i], cache["v"][i], index, kv_mask, level
            )
            new_k.append(ck)
            new_v.append(cv)
        logits = self.classifier(x.astype(jnp.float32))[:, 0, :]
        new_cache = {
            "k": jnp.stack(new_k),
            "v": jnp.stack(new_v),
            "mask": kv_mask,
            "index": index + 1,
            "pos": cache["pos"] + 1,
        }
        return logits, new_cache

    def decode_chunk(self, tokens: jax.Array, pos0: jax.Array, cache: dict):
        """Teacher-forced multi-token decode — the speculative verify step.

        tokens: (B, W) resp tokens fed at once; row b's token j sits at
        packed position ``pos0[b] + j`` and cache slot ``index + j``.
        Returns (logits (B, W, V), new cache): ``logits[:, j]`` is the
        next-token distribution after feeding ``tokens[:, : j + 1]`` —
        exactly what the speculative acceptance rule needs.  All W slots
        are marked valid here; the caller re-masks rejected ones
        (``models/ar.py mask_slots``)."""
        B, W = tokens.shape
        emb = self.resps_emb.weight[0, tokens]  # (B, W, D)
        pos = pos0[:, None] + jnp.arange(W)[None, :]
        emb = emb + sinusoidal_embedding(pos, self.d_model)
        x = emb.astype(self.dtype)

        index = cache["index"]
        kv_mask = jax.lax.dynamic_update_slice(
            cache["mask"], jnp.ones((B, W), cache["mask"].dtype), (0, index)
        )
        level = jnp.zeros((B,), dtype=jnp.int32)
        new_k, new_v = [], []
        for i, block in enumerate(self.blocks):
            x, ck, cv = block.decode_chunk(
                x, cache["k"][i], cache["v"][i], index, kv_mask, level
            )
            new_k.append(ck)
            new_v.append(cv)
        logits = self.classifier(x.astype(jnp.float32))  # (B, W, V)
        new_cache = {
            "k": jnp.stack(new_k),
            "v": jnp.stack(new_v),
            "mask": kv_mask,
            "index": index + W,
            "pos": cache["pos"] + W,
        }
        return logits, new_cache


def build_targets(
    text: jax.Array,
    text_mask: jax.Array,
    prom_mask: jax.Array,
    targ: jax.Array,  # (B, Tr) single-level targets
    resp_mask: jax.Array,
    *,
    resp_loss_only: bool,
    shift: bool,
    stop_token: int | None,
) -> jax.Array:
    """Build the (B, T) target array over the merged layout (≡ ``base.py:445-488``).

    - ``resp_loss_only`` (NAR): everything except resp positions ignored;
      resp position j has target ``targ[j]`` (no shift).
    - AR (``shift=True``): packed next-token prediction.  Text position j
      targets ``text[j+1]`` (final text position ignored — it is followed by
      the sep); prom positions ignored; resp position j targets
      ``targ[j+1]``; the final valid resp position targets ``stop_token``;
      the sep before resps targets ``targ[0]`` (intent fix, see module doc).
    """
    B, Tt = text.shape
    ig = IGNORE_INDEX

    if resp_loss_only:
        t_text = jnp.full((B, Tt), ig)
        sep1 = jnp.full((B, 1), ig)
        t_prom = jnp.full((B, prom_mask.shape[1]), ig)
        sep2 = jnp.full((B, 1), ig)
        t_resp = jnp.where(resp_mask > 0, targ, ig)
    else:
        assert shift and stop_token is not None
        text_next = jnp.concatenate(
            [text[:, 1:], jnp.zeros((B, 1), dtype=text.dtype)], axis=1
        )
        next_valid = jnp.concatenate(
            [text_mask[:, 1:], jnp.zeros((B, 1), dtype=text_mask.dtype)], axis=1
        )
        t_text = jnp.where((text_mask * next_valid) > 0, text_next, ig)
        sep1 = jnp.full((B, 1), ig)
        t_prom = jnp.full((B, prom_mask.shape[1]), ig)
        has_resp = resp_mask.sum(axis=1, keepdims=True) > 0
        sep2 = jnp.where(has_resp, targ[:, :1], ig)
        targ_next = jnp.concatenate(
            [targ[:, 1:], jnp.zeros((B, 1), dtype=targ.dtype)], axis=1
        )
        next_resp_valid = jnp.concatenate(
            [resp_mask[:, 1:], jnp.zeros((B, 1), dtype=resp_mask.dtype)], axis=1
        )
        is_last = (resp_mask > 0) & (next_resp_valid == 0)
        t_resp = jnp.where(resp_mask > 0, targ_next, ig)
        t_resp = jnp.where(is_last, stop_token, t_resp)

    parts = (t_text, sep1, t_prom, sep2, t_resp)
    return jnp.concatenate([p.astype(jnp.int32) for p in parts], axis=1)


def masked_cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean CE over positions whose target != IGNORE_INDEX (≡ F.cross_entropy
    with ignore_index=-100)."""
    valid = targets != IGNORE_INDEX
    safe_t = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(valid.sum(), 1)
    return nll.sum() / denom


def sample_categorical(
    rng: jax.Array | None,
    logits: jax.Array,
    temperature: float = 1.0,
    gumbel_noise: jax.Array | None = None,
) -> jax.Array:
    """Temperature sampling with an injectable noise source.

    Parity note (SURVEY §7.3): torch and jax PRNGs differ, so stochastic
    parity is defined under injected noise — tests pass ``gumbel_noise``
    explicitly; production passes ``rng``.  ``temperature <= 0`` → greedy.
    """
    logits = logits.astype(jnp.float32)
    if temperature <= 0:
        return jnp.argmax(logits, axis=-1)
    scaled = logits / temperature
    if gumbel_noise is None:
        if rng is None:
            raise ValueError("Need rng or gumbel_noise for stochastic sampling")
        gumbel_noise = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
    return jnp.argmax(scaled + gumbel_noise, axis=-1)
