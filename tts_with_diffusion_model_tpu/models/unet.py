"""Conv-UNet denoiser for the value-domain Gaussian diffusion family.

TPU-native analogue of the ``diffusers.UNet2DConditionModel`` the
reference's ``ar-last`` variant uses as its denoiser
(``vall_e/vall_e/ar-last.py:186``: in/out_channels=1, cross-attention to
concatenated prompt/text towers, trained on normalized token values,
``:389-413``).  The published UNet is 2-D image machinery; a token
sequence is 1-D, so this is the idiomatic re-expression: an NWC ``Conv1d``
pyramid (XLA maps NWC convs straight onto the MXU) of FiLM-modulated
residual blocks with strided down-sampling, cross-attention to the
text/speaker conditioning towers at every resolution below the top, and a
skip-connected up path — the same architecture family, shaped for the
hardware and the data.

Exposes the ``conds`` / ``denoise`` interface of
``models/gaussian_tts.GaussianDenoiser`` so ``GaussianDiffusionModel``
drives it unchanged (registry name ``diffusion-gaussian-unet2d``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .base import EMBED, VOCAB, MultiEmbedding, sinusoidal_embedding
from .dit import MHA, CondTower


class MaskedGroupNorm(nn.Module):
    """GroupNorm whose statistics cover only valid (unmasked) frames.

    Plain GroupNorm over a padded (B, T, C) sequence folds the zeroed
    padding into mean/variance, so a frame's activations change with the
    bucket's padding amount — the same utterance run at a different
    ``resp_len`` bucket would normalize differently (round-2 ADVICE).
    Statistics here are per (batch, group) over valid frames × group
    channels, computed in fp32; padded frames come out zero."""

    num_groups: int
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x, mask):
        B, T, C = x.shape
        G = self.num_groups
        dt = x.dtype
        xf = x.astype(jnp.float32)
        m = mask.astype(jnp.float32)                      # (B, T)
        cnt = jnp.maximum(m.sum(axis=1), 1.0) * (C // G)  # (B,) per-group N
        xg = (xf * m[..., None]).reshape(B, T, G, C // G)
        mean = xg.sum(axis=(1, 3)) / cnt[:, None]         # (B, G)
        centered = (xg - mean[:, None, :, None]) * m[..., None, None]
        var = (centered ** 2).sum(axis=(1, 3)) / cnt[:, None]
        inv = jax.lax.rsqrt(var + self.epsilon)
        y = (centered * inv[:, None, :, None]).reshape(B, T, C)
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        y = y * scale + bias
        return (y * m[..., None]).astype(dt)


class ConvResBlock(nn.Module):
    """GroupNorm → SiLU → Conv(k3) → FiLM(t) → GroupNorm → SiLU → Conv(k3)
    with a 1×1-conv (or identity) skip — the diffusers ResnetBlock2D recipe
    in 1-D.  Norm statistics are masked to valid frames (bucket-size
    invariant)."""

    ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, t_emb, mask):
        m = mask[..., None].astype(x.dtype)
        dt = self.dtype
        groups = 8 if self.ch % 8 == 0 else 1
        h = MaskedGroupNorm(num_groups=groups, name="norm1")(x, mask)
        h = nn.Conv(self.ch, (3,), padding="SAME", dtype=dt,
                    name="conv1")(nn.silu(h) * m)
        ss = nn.Dense(2 * self.ch, dtype=dt, name="film")(nn.silu(t_emb))
        scale, shift = jnp.split(ss[:, None, :], 2, axis=-1)
        h = h * (1 + scale) + shift
        h = MaskedGroupNorm(num_groups=groups, name="norm2")(h, mask)
        h = nn.Conv(self.ch, (3,), padding="SAME", dtype=dt,
                    name="conv2")(nn.silu(h) * m)
        if x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1,), dtype=dt, name="skip")(x)
        return (x + h) * m


class CrossAttnBlock(nn.Module):
    """Pre-norm cross-attention of the sequence over a conditioning stream
    (the Transformer2DModel cross-attn inside diffusers down/up blocks)."""

    ch: int
    n_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, cond, q_mask, kv_mask):
        cond = nn.Dense(self.ch, dtype=self.dtype, name="cond_proj")(cond)
        h = nn.LayerNorm(name="norm")(x)
        h = MHA(self.ch, self.n_heads, dtype=self.dtype,
                name="attn")(h, cond, q_mask, kv_mask)
        return x + h


def _downsample_mask(mask):
    """Validity of stride-2 frames: valid when either source slot is."""
    B, T = mask.shape
    pad = (-T) % 2
    m = jnp.pad(mask, ((0, 0), (0, pad)))
    return m.reshape(B, -1, 2).max(axis=-1)


class ConvUNetDenoiser(nn.Module):
    """The full ε-prediction UNet: value-domain input (B, Tr, in_dim) →
    ε̂ (B, Tr, in_dim), conditioned on text/speaker towers + timestep."""

    in_dim: int
    d_model: int            # conditioning-tower width
    n_heads: int
    n_classes: int
    n_prom_levels: int
    timesteps: int
    channels: Sequence[int] = (64, 128, 256)
    dtype: Any = jnp.bfloat16

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
        dt = self.dtype
        self.text_tower = CondTower(self.d_model, self.n_heads, mlp_mult=2,
                                    dtype=dt)
        self.prom_tower = CondTower(self.d_model, self.n_heads, mlp_mult=3,
                                    dtype=dt)
        self.time_emb = nn.Embed(self.timesteps + 1, self.channels[0])
        self.time_mlp = nn.Dense(self.channels[0] * 4, dtype=dt)

        chs = list(self.channels)
        self.conv_in = nn.Conv(chs[0], (3,), padding="SAME", dtype=dt)
        self.down_res = [
            ConvResBlock(c, dtype=dt, name=f"down_res_{i}")
            for i, c in enumerate(chs)
        ]
        self.down_attn = [
            CrossAttnBlock(c, self.n_heads, dtype=dt, name=f"down_attn_{i}")
            for i, c in enumerate(chs)
        ]
        self.downsamplers = [
            nn.Conv(c, (3,), strides=(2,), padding="SAME", dtype=dt,
                    name=f"down_{i}")
            for i, c in enumerate(chs[1:])
        ]
        self.mid_res1 = ConvResBlock(chs[-1], dtype=dt)
        self.mid_attn = CrossAttnBlock(chs[-1], self.n_heads, dtype=dt)
        self.mid_res2 = ConvResBlock(chs[-1], dtype=dt)
        rev = list(reversed(chs))
        self.upsamplers = [
            nn.ConvTranspose(c, (4,), strides=(2,), padding="SAME", dtype=dt,
                             name=f"up_{i}")
            for i, c in enumerate(rev[1:])
        ]
        self.up_res = [
            ConvResBlock(c, dtype=dt, name=f"up_res_{i}")
            for i, c in enumerate(rev)
        ]
        self.up_attn = [
            CrossAttnBlock(c, self.n_heads, dtype=dt, name=f"up_attn_{i}")
            for i, c in enumerate(rev)
        ]
        self.norm_out = MaskedGroupNorm(num_groups=8 if chs[0] % 8 == 0 else 1)
        self.conv_out = nn.Conv(self.in_dim, (3,), padding="SAME",
                                dtype=jnp.float32)

    def conds(self, text, text_mask, proms, prom_mask):
        Tt, Tp = text.shape[1], proms.shape[1]
        te = self.text_emb(text) + sinusoidal_embedding(
            jnp.arange(Tt)[None], self.d_model
        )
        pe = self.proms_emb(proms) + sinusoidal_embedding(
            jnp.arange(Tp)[None], self.d_model
        )
        te = te.astype(self.dtype) * text_mask[..., None].astype(self.dtype)
        pe = pe.astype(self.dtype) * prom_mask[..., None].astype(self.dtype)
        # One concatenated conditioning stream (the reference concatenates
        # its prompt and text towers for the UNet's encoder_hidden_states,
        # ``ar-last.py:371-383``).
        cond = jnp.concatenate(
            [self.prom_tower(pe, prom_mask), self.text_tower(te, text_mask)],
            axis=1,
        )
        cond_mask = jnp.concatenate([prom_mask, text_mask], axis=1)
        return cond, cond_mask

    def denoise(self, x_t, resp_mask, t, cond, cond_mask,
                spkr_cond=None, prom_mask=None):
        """Signature-compatible with ``GaussianDenoiser.denoise`` — the
        (text_cond, text_mask) slots carry the concatenated (cond, cond_mask)
        pair from ``conds``; the trailing two slots are unused."""
        del spkr_cond, prom_mask
        x = x_t.astype(self.dtype)
        t_emb = self.time_mlp(self.time_emb(t)).astype(self.dtype)
        cond = cond.astype(self.dtype)

        x = self.conv_in(x * resp_mask[..., None].astype(self.dtype))
        mask = resp_mask
        skips, masks = [], []
        for i, (res, attn) in enumerate(zip(self.down_res, self.down_attn)):
            x = res(x, t_emb, mask)
            x = attn(x, cond, mask, cond_mask)
            skips.append(x)
            masks.append(mask)
            if i < len(self.downsamplers):
                x = self.downsamplers[i](x)
                mask = _downsample_mask(mask)
                x = x * mask[..., None].astype(x.dtype)

        x = self.mid_res1(x, t_emb, mask)
        x = self.mid_attn(x, cond, mask, cond_mask)
        x = self.mid_res2(x, t_emb, mask)

        for i, (res, attn) in enumerate(zip(self.up_res, self.up_attn)):
            if i > 0:
                x = self.upsamplers[i - 1](x)
                mask = masks[-i - 1]
                x = x[:, : mask.shape[1]] * mask[..., None].astype(x.dtype)
                x = jnp.concatenate([x, skips[-i - 1]], axis=-1)
            x = res(x, t_emb, mask)
            x = attn(x, cond, mask, cond_mask)

        x = nn.silu(self.norm_out(x, mask))  # mask is back at full resolution
        eps = self.conv_out(x.astype(jnp.float32))
        return eps * resp_mask[..., None]

    def __call__(self, text, text_mask, proms, prom_mask, x_t, resp_mask, t):
        cond, cond_mask = self.conds(text, text_mask, proms, prom_mask)
        return self.denoise(x_t, resp_mask, t, cond, cond_mask)
