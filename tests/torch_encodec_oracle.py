"""Torch oracle: the complete published EnCodec-24kHz architecture.

Built from torch primitives (weight-normed convs, ELU, 2-layer residual
LSTM, residual VQ) at the published topology — encoder
1→32→64→128→256→512→128 with strides (2,4,5,8), mirror decoder, 32×1024×128
codebooks — emitting a ``state_dict`` in the exact key layout of the
published ``encodec_24khz`` checkpoint (``encoder.model.{i}...``,
``quantizer.vq.layers.{q}._codebook.embed``) so ``codec/convert.py``
consumes it unchanged.

This closes the codec-fidelity loop as far as this environment allows
(VERDICT: no real checkpoint is downloadable here): the *full-architecture*
converted graph is proven numerically equivalent to torch semantics, so a
real checkpoint conversion differs only by tensor values.
Reference semantics: ``/root/reference/vall_e/emb/qnt.py:18-69``.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

RATIOS = (8, 5, 4, 2)  # decoder order; encoder uses reversed
N_FILTERS = 32
DIMENSION = 128
BINS = 1024
N_Q = 32
HOP = 320


def _wn(conv):
    return nn.utils.weight_norm(conv)


def _extra_padding(length: int, k: int, s: int) -> int:
    pad_total = k - s
    n_frames = (length - k + pad_total) / s + 1
    ideal = (math.ceil(n_frames) - 1) * s + (k - pad_total)
    return max(0, ideal - length)


def _causal_pad(x: torch.Tensor, k: int, s: int = 1) -> torch.Tensor:
    """Left-pad (causal) + right frame-completion padding, reflect mode."""
    return F.pad(x, (k - s, _extra_padding(x.shape[-1], k, s)), mode="reflect")


class _ResBlock(nn.Module):
    """ELU→conv(k3, dim→dim/2)→ELU→conv(k1)→(+ 1×1 conv shortcut)."""

    def __init__(self, dim: int):
        super().__init__()
        self.block = nn.ModuleList(
            [
                nn.ELU(),
                _wn(nn.Conv1d(dim, dim // 2, 3)),
                nn.ELU(),
                _wn(nn.Conv1d(dim // 2, dim, 1)),
            ]
        )
        self.shortcut = _wn(nn.Conv1d(dim, dim, 1))

    def forward(self, x):
        h = self.block[1](_causal_pad(F.elu(x), 3))
        h = self.block[3](_causal_pad(F.elu(h), 1))
        return self.shortcut(_causal_pad(x, 1)) + h

    def sd(self, prefix: str) -> dict:
        out = {}
        for idx in (1, 3):
            m = self.block[idx]
            out[f"{prefix}.block.{idx}.conv.weight_v"] = m.weight_v.detach().numpy()
            out[f"{prefix}.block.{idx}.conv.weight_g"] = m.weight_g.detach().numpy()
            out[f"{prefix}.block.{idx}.conv.bias"] = m.bias.detach().numpy()
        out[f"{prefix}.shortcut.conv.weight_v"] = self.shortcut.weight_v.detach().numpy()
        out[f"{prefix}.shortcut.conv.weight_g"] = self.shortcut.weight_g.detach().numpy()
        out[f"{prefix}.shortcut.conv.bias"] = self.shortcut.bias.detach().numpy()
        return out


def _conv_sd(m, prefix: str) -> dict:
    return {
        f"{prefix}.conv.weight_v": m.weight_v.detach().numpy(),
        f"{prefix}.conv.weight_g": m.weight_g.detach().numpy(),
        f"{prefix}.conv.bias": m.bias.detach().numpy(),
    }


def _convtr_sd(m, prefix: str) -> dict:
    return {
        f"{prefix}.convtr.weight_v": m.weight_v.detach().numpy(),
        f"{prefix}.convtr.weight_g": m.weight_g.detach().numpy(),
        f"{prefix}.convtr.bias": m.bias.detach().numpy(),
    }


def _lstm_sd(m, prefix: str) -> dict:
    return {
        f"{prefix}.lstm.{k}": v.detach().numpy() for k, v in m.named_parameters()
    }


class TorchEncodec24k(nn.Module):
    """Full-topology torch EnCodec-24kHz with random weights (fixed seed)."""

    def __init__(self, seed: int = 0):
        super().__init__()
        torch.manual_seed(seed)
        f = N_FILTERS

        # --- encoder: strides 2,4,5,8 (reversed RATIOS), channels ×2 each
        self.enc_in = _wn(nn.Conv1d(1, f, 7))
        self.enc_blocks = nn.ModuleList()
        self.enc_down = nn.ModuleList()
        mult = 1
        for r in reversed(RATIOS):
            self.enc_blocks.append(_ResBlock(mult * f))
            self.enc_down.append(
                _wn(nn.Conv1d(mult * f, mult * f * 2, 2 * r, stride=r))
            )
            mult *= 2
        self.enc_lstm = nn.LSTM(mult * f, mult * f, num_layers=2)
        self.enc_out = _wn(nn.Conv1d(mult * f, DIMENSION, 7))

        # --- decoder: mirror
        self.dec_in = _wn(nn.Conv1d(DIMENSION, mult * f, 7))
        self.dec_lstm = nn.LSTM(mult * f, mult * f, num_layers=2)
        self.dec_up = nn.ModuleList()
        self.dec_blocks = nn.ModuleList()
        for r in RATIOS:
            self.dec_up.append(
                _wn(nn.ConvTranspose1d(mult * f, mult * f // 2, 2 * r, stride=r))
            )
            self.dec_blocks.append(_ResBlock(mult * f // 2))
            mult //= 2
        self.dec_out = _wn(nn.Conv1d(f, 1, 7))

        self.codebooks = torch.randn(N_Q, BINS, DIMENSION)
        self.eval()

    # ---------------- forward paths ----------------

    @torch.no_grad()
    def encode_latents(self, wav: torch.Tensor) -> torch.Tensor:
        """wav (B, 1, T) → latents (B, frames, DIMENSION)."""
        h = self.enc_in(_causal_pad(wav, 7))
        strides = list(reversed(RATIOS))
        for blk, down, r in zip(self.enc_blocks, self.enc_down, strides):
            h = blk(h)
            h = down(_causal_pad(F.elu(h), 2 * r, r))
        y, _ = self.enc_lstm(h.permute(2, 0, 1))
        h = h + y.permute(1, 2, 0)
        h = self.enc_out(_causal_pad(F.elu(h), 7))
        return h.permute(0, 2, 1)

    @torch.no_grad()
    def rvq_encode(self, z: torch.Tensor, n_q: int = 8) -> torch.Tensor:
        """z (B, T, D) → codes (B, n_q, T); Euclidean nearest-code residual VQ."""
        residual = z
        codes = []
        for q in range(n_q):
            e = self.codebooks[q]  # (K, D)
            dist = (
                residual.pow(2).sum(-1, keepdim=True)
                - 2 * residual @ e.t()
                + e.pow(2).sum(-1)
            )
            idx = dist.argmin(-1)
            codes.append(idx)
            residual = residual - e[idx]
        return torch.stack(codes, dim=1)

    @torch.no_grad()
    def rvq_decode(self, codes: torch.Tensor) -> torch.Tensor:
        out = torch.zeros(
            codes.shape[0], codes.shape[2], DIMENSION, dtype=torch.float32
        )
        for q in range(codes.shape[1]):
            out = out + self.codebooks[q][codes[:, q]]
        return out

    @torch.no_grad()
    def decode_latents(self, z: torch.Tensor) -> torch.Tensor:
        """z (B, T, D) → wav (B, 1, T·320)."""
        h = self.dec_in(_causal_pad(z.permute(0, 2, 1), 7))
        y, _ = self.dec_lstm(h.permute(2, 0, 1))
        h = h + y.permute(1, 2, 0)
        for up, blk, r in zip(self.dec_up, self.dec_blocks, RATIOS):
            k = 2 * r
            y = up(F.elu(h))
            h = blk(y[..., : y.shape[-1] - (k - r)])  # causal right-trim
        return self.dec_out(_causal_pad(F.elu(h), 7))

    # ---------------- checkpoint-layout state dict ----------------

    def checkpoint_state_dict(self) -> dict:
        sd = {}
        sd.update(_conv_sd(self.enc_in, "encoder.model.0"))
        for i in range(4):
            sd.update(self.enc_blocks[i].sd(f"encoder.model.{1 + 3 * i}"))
            sd.update(_conv_sd(self.enc_down[i], f"encoder.model.{3 + 3 * i}"))
        sd.update(_lstm_sd(self.enc_lstm, "encoder.model.13"))
        sd.update(_conv_sd(self.enc_out, "encoder.model.15"))

        sd.update(_conv_sd(self.dec_in, "decoder.model.0"))
        sd.update(_lstm_sd(self.dec_lstm, "decoder.model.1"))
        for i in range(4):
            sd.update(_convtr_sd(self.dec_up[i], f"decoder.model.{3 + 3 * i}"))
            sd.update(self.dec_blocks[i].sd(f"decoder.model.{4 + 3 * i}"))
        # final conv sits after the trailing ELU: index 15, as in the real
        # checkpoint layout (decoder = [conv0, lstm1, (elu, convtr, res)×4,
        # elu14, conv15])
        sd.update(_conv_sd(self.dec_out, "decoder.model.15"))

        for q in range(N_Q):
            sd[f"quantizer.vq.layers.{q}._codebook.embed"] = (
                self.codebooks[q].numpy()
            )
        return sd
