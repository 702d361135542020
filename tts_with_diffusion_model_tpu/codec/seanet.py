"""SEANet encoder/decoder for the EnCodec-24kHz-compatible neural codec.

TPU-native Flax implementation of the architecture the reference uses via
the ``encodec`` pip package (``vall_e/emb/qnt.py:18-25``: pretrained 24 kHz
model at 6 kbps → 8 RVQ levels × 1024 codes, 75 frames/s):

  encoder: Conv1d(1→32, k7) → 4× [ResnetBlock; ELU; downsample conv
           (k=2r, stride r) doubling channels] with ratios (reversed) 2,4,5,8
           → 2-layer residual LSTM → ELU → Conv1d(→128, k7)
  decoder: the exact mirror with transposed convs.

All convolutions are **causal** (streaming padding on the left, exactly the
reference codec's frame alignment) and **weight-normalized** (parameters
stored as (v, g), composed at call time) so published torch checkpoints map
1:1 through ``codec/convert.py``.  Layout is (B, T, C) with kernels
(K, Cin, Cout) — XLA's preferred NWC on TPU; torch NCW weights are
transposed once at conversion.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _norm_kernel(v: jax.Array, g: jax.Array, axes=(0, 1)) -> jax.Array:
    """Weight norm: w = g · v/‖v‖.

    For regular convs (kernel (K, Cin, Cout)) torch normalizes per output
    channel → axes (0, 1); for transposed convs torch's ``weight_norm``
    default dim=0 normalizes per *input* channel (weight (Cin, Cout, K)) →
    axes (0, 2) in our (K, Cin, Cout) layout.
    """
    norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, axis=axes, keepdims=True))
    return (g / jnp.maximum(norm, 1e-12)) * v


def pad1d(x: jax.Array, pad_left: int, pad_right: int, mode: str = "reflect"):
    """Pad (B, T, C) along T; reflect-pads handle short inputs like the
    reference codec (zero-pad up to the needed length first)."""
    if mode == "reflect":
        T = x.shape[1]
        max_pad = max(pad_left, pad_right)
        extra = 0
        if T <= max_pad:
            extra = max_pad - T + 1
            x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
        y = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="reflect")
        if extra:
            y = y[:, : y.shape[1] - extra, :]
        return y
    return jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))


def extra_padding_for_frames(length: int, kernel: int, stride: int, pad_total: int) -> int:
    """Right padding making the last conv frame complete (≡ encodec's
    get_extra_padding_for_conv1d semantics)."""
    n_frames = (length - kernel + pad_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (kernel - pad_total)
    return max(0, ideal - length)


class StreamableConv1d(nn.Module):
    """Causal weight-normed Conv1d, (B, T, Cin) → (B, T', Cout)."""

    in_ch: int
    out_ch: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    pad_mode: str = "reflect"
    causal: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        v = self.param(
            "v",
            nn.initializers.lecun_normal(),
            (self.kernel, self.in_ch, self.out_ch),
        )
        g = self.param("g", nn.initializers.ones, (1, 1, self.out_ch))
        b = self.param("b", nn.initializers.zeros, (self.out_ch,))
        w = _norm_kernel(v, g)

        k_eff = (self.kernel - 1) * self.dilation + 1
        pad_total = k_eff - self.stride
        extra = extra_padding_for_frames(
            x.shape[1], k_eff, self.stride, pad_total
        )
        if self.causal:
            x = pad1d(x, pad_total, extra, self.pad_mode)
        else:
            half = pad_total // 2
            x = pad1d(x, half, pad_total - half + extra, self.pad_mode)

        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(self.stride,),
            padding="VALID",
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + b


class StreamableConvTranspose1d(nn.Module):
    """Causal weight-normed transposed Conv1d (upsampling); right-trims the
    ``kernel - stride`` overhang (trim_right_ratio = 1, streaming mode)."""

    in_ch: int
    out_ch: int
    kernel: int
    stride: int = 1
    causal: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        v = self.param(
            "v",
            nn.initializers.lecun_normal(),
            (self.kernel, self.in_ch, self.out_ch),
        )
        g = self.param("g", nn.initializers.ones, (1, self.in_ch, 1))
        b = self.param("b", nn.initializers.zeros, (self.out_ch,))
        w = _norm_kernel(v, g, axes=(0, 2))

        # torch ConvTranspose1d ≡ lhs-dilated correlation with the kernel
        # flipped along K: y[m·s + k] += x[m] · w[k].
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(w, axis=0),
            window_strides=(1,),
            padding=[(self.kernel - 1, self.kernel - 1)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        y = y + b
        pad_total = self.kernel - self.stride
        if pad_total > 0:
            if self.causal:
                y = y[:, :-pad_total, :]  # trim all overhang on the right
            else:
                left = pad_total // 2
                y = y[:, left : y.shape[1] - (pad_total - left), :]
        return y


class SEANetResnetBlock(nn.Module):
    """[ELU → Conv(k3, dim→dim/2) → ELU → Conv(k1, dim/2→dim)] + shortcut.

    ``true_skip=False`` (the published EnCodec-24kHz configuration) uses a
    1×1 conv shortcut; True uses the identity."""

    dim: int
    compress: int = 2
    pad_mode: str = "reflect"
    true_skip: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = self.dim // self.compress
        h = nn.elu(x)
        h = StreamableConv1d(self.dim, hidden, 3, pad_mode=self.pad_mode,
                             name="conv1")(h)
        h = nn.elu(h)
        h = StreamableConv1d(hidden, self.dim, 1, pad_mode=self.pad_mode,
                             name="conv2")(h)
        if self.true_skip:
            return x + h
        s = StreamableConv1d(self.dim, self.dim, 1, pad_mode=self.pad_mode,
                             name="shortcut")(x)
        return s + h


class ResidualLSTM(nn.Module):
    """2-layer LSTM with a residual connection over the whole stack
    (≡ encodec's SLSTM with skip=True).  torch gate order (i, f, g, o) and
    packed (C, 4H)/(H, 4H) kernels so checkpoints convert directly."""

    dim: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, C = x.shape
        y = x.astype(jnp.float32)
        for layer in range(self.num_layers):
            w_ih = self.param(
                f"w_ih_l{layer}", nn.initializers.lecun_normal(), (C, 4 * self.dim)
            )
            w_hh = self.param(
                f"w_hh_l{layer}", nn.initializers.lecun_normal(),
                (self.dim, 4 * self.dim),
            )
            b = self.param(f"b_l{layer}", nn.initializers.zeros, (4 * self.dim,))

            xw = y @ w_ih + b  # (B, T, 4H) — hoist the input matmul out of scan

            def cell(carry, xt):
                h, c = carry
                gates = xt + h @ w_hh
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (h, c), h

            init = (
                jnp.zeros((B, self.dim), jnp.float32),
                jnp.zeros((B, self.dim), jnp.float32),
            )
            _, hs = jax.lax.scan(cell, init, jnp.moveaxis(xw, 0, 1))
            y = jnp.moveaxis(hs, 0, 1)
        return x + y  # residual over the LSTM stack


class SEANetEncoder(nn.Module):
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    ratios: Sequence[int] = (8, 5, 4, 2)
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, T, 1) waveform → (B, frames, dimension) latents."""
        mult = 1
        h = StreamableConv1d(
            self.channels, self.n_filters, 7, pad_mode=self.pad_mode, name="conv_in"
        )(x)
        for i, ratio in enumerate(reversed(self.ratios)):
            ch = mult * self.n_filters
            h = SEANetResnetBlock(ch, pad_mode=self.pad_mode, name=f"block_{i}")(h)
            h = nn.elu(h)
            h = StreamableConv1d(
                ch, ch * 2, 2 * ratio, stride=ratio, pad_mode=self.pad_mode,
                name=f"down_{i}",
            )(h)
            mult *= 2
        ch = mult * self.n_filters
        h = ResidualLSTM(ch, name="lstm")(h)
        h = nn.elu(h)
        h = StreamableConv1d(
            ch, self.dimension, 7, pad_mode=self.pad_mode, name="conv_out"
        )(h)
        return h


class SEANetDecoder(nn.Module):
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    ratios: Sequence[int] = (8, 5, 4, 2)
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        """z: (B, frames, dimension) → (B, T, 1) waveform."""
        mult = int(2 ** len(self.ratios))
        ch = mult * self.n_filters
        h = StreamableConv1d(
            self.dimension, ch, 7, pad_mode=self.pad_mode, name="conv_in"
        )(z)
        h = ResidualLSTM(ch, name="lstm")(h)
        for i, ratio in enumerate(self.ratios):
            ch = mult * self.n_filters
            h = nn.elu(h)
            h = StreamableConvTranspose1d(
                ch, ch // 2, 2 * ratio, stride=ratio, name=f"up_{i}"
            )(h)
            h = SEANetResnetBlock(ch // 2, pad_mode=self.pad_mode,
                                  name=f"block_{i}")(h)
            mult //= 2
        h = nn.elu(h)
        h = StreamableConv1d(
            self.n_filters, self.channels, 7, pad_mode=self.pad_mode,
            name="conv_out",
        )(h)
        return h
