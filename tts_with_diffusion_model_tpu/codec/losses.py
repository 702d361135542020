"""Codec training losses: time-domain, multi-scale spectral, and VQ terms.

The reference consumes a *pretrained* EnCodec and ships no codec training
(SURVEY §2.3); in environments without the published checkpoint the codec
must be trainable from scratch.  This module provides the standard neural
codec reconstruction objective, TPU-native:

  - L1 waveform loss,
  - multi-scale STFT loss (spectral convergence + log-magnitude L1 over a
    bank of FFT sizes — the non-adversarial part of EnCodec's recipe),
  - VQ commitment/codebook losses with straight-through gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def stft_mag(x: jax.Array, frame: int, hop: int) -> jax.Array:
    """Magnitude STFT of (B, T) → (B, frames, frame//2+1), Hann window."""
    B, T = x.shape
    n_frames = 1 + (T - frame) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame)[None, :]
    frames = x[:, idx]  # (B, n_frames, frame)
    window = jnp.hanning(frame).astype(x.dtype)
    spec = jnp.fft.rfft(frames * window, axis=-1)
    return jnp.abs(spec)


def multiscale_stft_loss(
    x: jax.Array,
    y: jax.Array,
    frame_sizes=(2048, 1024, 512, 256),
    eps: float = 1e-5,
) -> jax.Array:
    """Σ over scales of (spectral convergence + log-mag L1)."""
    total = 0.0
    for frame in frame_sizes:
        if x.shape[-1] < frame:
            continue
        hop = frame // 4
        mx = stft_mag(x, frame, hop)
        my = stft_mag(y, frame, hop)
        sc = jnp.linalg.norm(mx - my) / jnp.maximum(jnp.linalg.norm(mx), eps)
        logmag = jnp.abs(jnp.log(mx + eps) - jnp.log(my + eps)).mean()
        total = total + sc + logmag
    return total


def vq_losses(z: jax.Array, z_q: jax.Array, beta: float = 0.25):
    """VQ-VAE codebook + commitment losses.

    z: encoder latents; z_q: quantized latents (pre-straight-through).
    Returns (codebook_loss, commitment_loss).
    """
    codebook = ((jax.lax.stop_gradient(z) - z_q) ** 2).mean()
    commit = ((z - jax.lax.stop_gradient(z_q)) ** 2).mean()
    return codebook, beta * commit


def straight_through(z: jax.Array, z_q: jax.Array) -> jax.Array:
    """Forward z_q, backward identity to z."""
    return z + jax.lax.stop_gradient(z_q - z)


def codec_reconstruction_loss(
    model,
    params,
    wav: jax.Array,  # (B, T, 1)
    num_quantizers: int = 8,
    stft_weight: float = 1.0,
    l1_weight: float = 0.1,
):
    """Full reconstruction objective through encoder → RVQ(STE) → decoder."""
    variables = params

    z = model.apply(variables, wav, method=type(model).encode_latents)
    z_q, codes = model.apply(
        variables, z, num_quantizers, method=type(model).quantize_latents
    )
    cb_loss, commit_loss = vq_losses(z, z_q)
    z_st = straight_through(z, z_q)
    recon = model.apply(variables, z_st, method=type(model).decode_latents)

    T = min(wav.shape[1], recon.shape[1])
    x = wav[:, :T, 0]
    y = recon[:, :T, 0]
    l1 = jnp.abs(x - y).mean()
    spec = multiscale_stft_loss(x, y)

    loss = stft_weight * spec + l1_weight * l1 + cb_loss + commit_loss
    stats = {
        "stft": spec,
        "l1": l1,
        "codebook": cb_loss,
        "commit": commit_loss,
    }
    return loss, stats
