"""Faithful-topology ``UNet2DConditionModel`` denoiser (the ar-last row).

The reference's last diffusion variant denoises normalized level-0 token
values with a diffusers ``UNet2DConditionModel(448, in_channels=1,
out_channels=1, encoder_hid_dim=448, block_out_channels=(320,640,1280,1280))``
(``vall_e/vall_e/ar-last.py:186``), fed a ``(B, 1, 1, 448)`` "image" of the
padded utterance (``:391-405``) and a 2-token ``encoder_hidden_states``
stream built from MLP-flattened prompt codes and text ids (``:370-383``).
``models/unet.py`` already covers the *capability* with a TPU-shaped 1-D
conv pyramid; this module closes the last inventory row by replicating the
published denoiser **topology** itself, re-expressed for TPU:

  - NHWC layout (XLA's native conv layout on TPU — the MXU consumes
    feature-minor tiles directly; NCHW would insert transposes),
  - bf16 compute / fp32 GroupNorm statistics and parameters,
  - ``jax.image.resize`` up-sampling pinned to the skip's spatial shape
    (what diffusers' ``upsample_size`` plumbing does dynamically, resolved
    statically here because every shape is static under jit).

Topology (diffusers defaults for the ar-last constructor arguments):
  conv_in 3×3 → 320
  down: CrossAttnDownBlock2D ×3 [2×(ResnetBlock2D + Transformer2D(1 block))]
        + DownBlock2D [2×ResnetBlock2D]; 3×3 stride-2 conv between blocks
  mid:  ResnetBlock2D + Transformer2D + ResnetBlock2D          (1280 ch)
  up:   UpBlock2D [3×Resnet] + CrossAttnUpBlock2D ×3 [3×(Resnet+Attn)],
        skip-concat from the down path, nearest ×2 + 3×3 conv between
  out:  GroupNorm(32) → SiLU → conv 3×3 → 1
  time: sinusoidal(320, flip_sin_to_cos, shift 0) → Dense 1280 → SiLU →
        Dense 1280; added inside every resnet
  cross-attention: 8 heads, width ch, kv from a 1280-wide stream
        (encoder_hid_proj: Dense 448 → 1280)
  transformer block: LN→self-attn, LN→cross-attn, LN→GEGLU FF (×4)

Registry name ``diffusion-gaussian-unet2d-ref`` (value domain); the
``conds``/``denoise`` interface matches ``models/unet.ConvUNetDenoiser`` so
``GaussianDiffusionModel`` drives it unchanged.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _gn_groups(ch: int, want: int = 32) -> int:
    """Largest divisor of ``ch`` not exceeding the diffusers default 32."""
    g = min(want, ch)
    while ch % g:
        g -= 1
    return g


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 statistics regardless of compute dtype."""

    ch: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        y = nn.GroupNorm(
            num_groups=_gn_groups(self.ch), epsilon=self.eps,
            dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(dt)


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Diffusers ``Timesteps(dim, flip_sin_to_cos=True, freq_shift=0)``:
    ``[cos | sin]`` halves, ``max_period`` 1e4."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


class ResnetBlock2D(nn.Module):
    """GN → SiLU → conv3×3 → (+time) → GN → SiLU → conv3×3, 1×1 skip."""

    ch: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, t_emb):
        dt = self.dtype
        h = nn.silu(GroupNorm32(x.shape[-1], name="norm1")(x))
        h = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=dt,
                    name="conv1")(h)
        h = h + nn.Dense(self.ch, dtype=dt, name="time_emb_proj")(
            nn.silu(t_emb)
        )[:, None, None, :]
        h = nn.silu(GroupNorm32(self.ch, name="norm2")(h))
        h = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=dt,
                    name="conv2")(h)
        if x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), dtype=dt, name="conv_shortcut")(x)
        return x + h


class GEGLUFeedForward(nn.Module):
    """Diffusers FF: Dense → GEGLU gate → Dense, inner = 4×ch."""

    ch: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        inner = self.ch * 4
        hg = nn.Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        h, gate = jnp.split(hg, 2, axis=-1)
        return nn.Dense(self.ch, dtype=self.dtype,
                        name="proj_out")(h * nn.gelu(gate))


class Attention(nn.Module):
    """Multi-head attention, q from ``x``, kv from ``ctx`` (or ``x``)."""

    ch: int
    n_heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        H = self.n_heads
        d = self.ch // H
        q = nn.Dense(self.ch, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.ch, use_bias=False, dtype=self.dtype, name="k")(ctx)
        v = nn.Dense(self.ch, use_bias=False, dtype=self.dtype, name="v")(ctx)
        sh = lambda a: a.reshape(*a.shape[:-1], H, d)
        att = jnp.einsum("bqhd,bkhd->bhqk", sh(q), sh(k)) / jnp.sqrt(d)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        o = jnp.einsum("bhqk,bkhd->bqhd", att, sh(v))
        o = o.reshape(*o.shape[:-2], self.ch)
        return nn.Dense(self.ch, dtype=self.dtype, name="out")(o)


class BasicTransformerBlock(nn.Module):
    """LN→self-attn, LN→cross-attn(1280-wide stream), LN→GEGLU FF."""

    ch: int
    n_heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, ctx):
        x = x + Attention(self.ch, self.n_heads, self.dtype, name="attn1")(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        )
        x = x + Attention(self.ch, self.n_heads, self.dtype, name="attn2")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x), ctx
        )
        return x + GEGLUFeedForward(self.ch, self.dtype, name="ff")(
            nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        )


class Transformer2D(nn.Module):
    """GN → 1×1 proj_in → flatten H·W tokens → blocks → proj_out + resid."""

    ch: int
    n_heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, ctx):
        B, H, W, C = x.shape
        resid = x
        h = GroupNorm32(C, eps=1e-6, name="norm")(x)
        h = nn.Conv(self.ch, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, self.ch)
        h = BasicTransformerBlock(self.ch, self.n_heads, self.dtype,
                                  name="block0")(h, ctx)
        h = h.reshape(B, H, W, self.ch)
        h = nn.Conv(self.ch, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + resid


class UNet2DConditionNet(nn.Module):
    """The full ε-UNet: sample (B, H, W, C_in) + t (B,) + encoder stream
    (B, S, cross_dim) → ε̂ (B, H, W, C_out)."""

    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    n_heads: int = 8
    cross_dim: int = 1280
    out_channels: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, sample, t, encoder_hidden_states):
        dt = self.dtype
        chs = list(self.block_out_channels)
        n_blocks = len(chs)
        tdim = chs[0] * 4

        t_emb = timestep_embedding(t, chs[0])
        t_emb = nn.Dense(tdim, dtype=dt, name="time_dense1")(
            t_emb.astype(dt)
        )
        t_emb = nn.Dense(tdim, dtype=dt, name="time_dense2")(nn.silu(t_emb))
        ctx = encoder_hidden_states.astype(dt)

        x = nn.Conv(chs[0], (3, 3), padding="SAME", dtype=dt,
                    name="conv_in")(sample.astype(dt))
        skips = [x]

        # down path: cross-attn blocks everywhere except the final one
        for i, ch in enumerate(chs):
            cross = i < n_blocks - 1
            for j in range(self.layers_per_block):
                x = ResnetBlock2D(ch, dt, name=f"down_{i}_res_{j}")(x, t_emb)
                if cross:
                    x = Transformer2D(ch, self.n_heads, dt,
                                      name=f"down_{i}_attn_{j}")(x, ctx)
                skips.append(x)
            if i < n_blocks - 1:
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                            dtype=dt, name=f"down_{i}_downsample")(x)
                skips.append(x)

        x = ResnetBlock2D(chs[-1], dt, name="mid_res_0")(x, t_emb)
        x = Transformer2D(chs[-1], self.n_heads, dt, name="mid_attn")(x, ctx)
        x = ResnetBlock2D(chs[-1], dt, name="mid_res_1")(x, t_emb)

        # up path: reversed channels; UpBlock2D (no attn) first, then
        # cross-attn up blocks — the mirror of the down layout
        for i, ch in enumerate(reversed(chs)):
            cross = i > 0
            for j in range(self.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock2D(ch, dt, name=f"up_{i}_res_{j}")(x, t_emb)
                if cross:
                    x = Transformer2D(ch, self.n_heads, dt,
                                      name=f"up_{i}_attn_{j}")(x, ctx)
            if i < n_blocks - 1:
                # diffusers pins interpolate to the next skip's spatial
                # shape (its ``upsample_size``); static under jit
                tgt = skips[-1].shape
                x = jax.image.resize(
                    x, (x.shape[0], tgt[1], tgt[2], x.shape[3]), "nearest"
                )
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=dt,
                            name=f"up_{i}_upsample")(x)

        x = nn.silu(GroupNorm32(chs[0], name="norm_out")(x))
        return nn.Conv(
            self.out_channels, (3, 3), padding="SAME", dtype=jnp.float32,
            name="conv_out",
        )(x.astype(jnp.float32))


class MLP(nn.Module):
    """timm-style Mlp (Dense → SiLU → Dense), the reference's conditioning
    projector (``ar-last.py:167-168``)."""

    hidden: int
    out: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.silu(nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x))
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(h)


class EncoderStack(nn.Module):
    """Self-attention encoder over the (short) conditioning sequence —
    the ``encodertext``/``encoder2`` towers (``ar-last.py:169-182``)."""

    ch: int
    n_layers: int
    n_heads: int
    mlp_mult: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_layers):
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln_{i}")(x)
            x = x + Attention(self.ch, self.n_heads, self.dtype,
                              name=f"attn_{i}")(h)
            h2 = nn.LayerNorm(dtype=self.dtype, name=f"ln2_{i}")(x)
            x = x + GEGLUFeedForward(self.ch, self.dtype, name=f"ff_{i}")(h2)
        return MLP(self.ch * self.mlp_mult, self.ch, self.dtype,
                   name="out_mlp")(x)


class UNet2DCondDenoiser(nn.Module):
    """ar-last's full denoiser stack behind the ``conds``/``denoise``
    interface of ``GaussianDiffusionModel`` (value domain, ``in_dim == 1``).

    Conditioning follows the reference: the whole prompt's codes are
    flattened to one vector → MLP → one 448-token, the padded text-id
    vector → MLP → a second token; each runs through its encoder stack and
    the 2-token concatenation is the UNet's ``encoder_hidden_states``
    (``ar-last.py:370-383``), lifted to the 1280-wide cross stream by
    ``encoder_hid_proj``."""

    in_dim: int
    d_model: int                 # encoder_hid_dim (448 in the reference)
    n_heads: int                 # UNet attention heads (8 ≡ diffusers)
    n_classes: int
    n_prom_levels: int
    timesteps: int
    text_len: int
    prom_len: int
    channels: Sequence[int] = (320, 640, 1280, 1280)
    enc_text_layers: int = 4
    enc_prom_layers: int = 10
    dtype: Any = jnp.bfloat16

    def setup(self):
        dt = self.dtype
        d = self.d_model
        flat = self.prom_len * self.n_prom_levels
        self.condition1_proj = MLP(min(2 * flat, 4 * d), d, dt)
        self.condition2_proj = MLP(2 * d, d, dt)
        self.encodertext = EncoderStack(d, self.enc_text_layers, 4, 2, dt)
        self.encoder2 = EncoderStack(d, self.enc_prom_layers, 4, 3, dt)
        self.encoder_hid_proj = nn.Dense(1280, dtype=dt)
        self.unet = UNet2DConditionNet(
            block_out_channels=tuple(self.channels),
            n_heads=self.n_heads,
            out_channels=self.in_dim,
            dtype=dt,
        )

    def conds(self, text, text_mask, proms, prom_mask):
        dt = self.dtype
        B = text.shape[0]
        # normalized value flattening, as the reference trains on values
        pflat = (proms * prom_mask[..., None]).astype(jnp.float32)
        pflat = (pflat / (self.n_classes - 1) * 2.0 - 1.0).reshape(B, -1)
        cond1 = self.condition1_proj(pflat.astype(dt))[:, None]
        tval = (text * text_mask).astype(jnp.float32) / max(
            self.n_classes - 1, 1
        )
        cond2 = self.condition2_proj(tval.astype(dt))[:, None]
        cond1 = self.encoder2(cond1)
        cond2 = self.encodertext(cond2)
        cond = jnp.concatenate([cond1, cond2], axis=1)  # (B, 2, d)
        cond_mask = jnp.ones((B, 2), jnp.float32)
        return cond, cond_mask

    def denoise(self, x_t, resp_mask, t, cond, cond_mask,
                spkr_cond=None, prom_mask=None):
        """x_t (B, Tr, in_dim) → ε̂ (B, Tr, in_dim) via the 2-D UNet on the
        (B, 1, Tr, in_dim) image layout the reference uses."""
        del cond_mask, spkr_cond, prom_mask
        m = resp_mask[..., None]
        ctx = self.encoder_hid_proj(cond)
        sample = (x_t * m)[:, None]  # NHWC, H=1
        eps = self.unet(sample, t, ctx)[:, 0]
        return eps * m

    def __call__(self, text, text_mask, proms, prom_mask, x_t, resp_mask, t):
        cond, cm = self.conds(text, text_mask, proms, prom_mask)
        return self.denoise(x_t, resp_mask, t, cond, cm)
