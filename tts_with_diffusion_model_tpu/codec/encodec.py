"""EnCodec-24kHz-compatible neural codec: encode wav → RVQ codes, decode back.

Replaces the reference's ``encodec`` dependency (``vall_e/emb/qnt.py``):
24 kHz, hop 320 (ratios 8·5·4·2) → 75 frames/s; 6 kbps ⇒ 8 active codebooks
of 1024 codes.  ``encode``/``decode`` are jit-compiled; conv/LSTM/RVQ all
run on-device as XLA ops (BASELINE.json: "EnCodec decoding to waveform runs
as vectorized conv kernels on device").

Weights: the published pretrained checkpoint can be converted with
``codec/convert.py`` (torch → flax, 1:1 parameter mapping).  Without it the
codec still runs (random init) — sufficient for shape/latency work and for
training a codec from scratch, but not for audio fidelity.
"""

from __future__ import annotations

import functools
import logging
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .rvq import ResidualVQ
from .seanet import SEANetDecoder, SEANetEncoder

_logger = logging.getLogger(__name__)

SAMPLE_RATE = 24_000
HOP = 320  # 8*5*4*2
FRAME_RATE = SAMPLE_RATE // HOP  # 75


class EncodecModel(nn.Module):
    """Encoder + RVQ + decoder.  Layout: wav (B, T, 1); codes (B, Q, frames)."""

    dimension: int = 128
    n_filters: int = 32
    n_q_total: int = 32
    bins: int = 1024

    def setup(self):
        self.encoder = SEANetEncoder(dimension=self.dimension, n_filters=self.n_filters)
        self.decoder = SEANetDecoder(dimension=self.dimension, n_filters=self.n_filters)
        self.quantizer = ResidualVQ(
            n_q=self.n_q_total, bins=self.bins, dim=self.dimension
        )

    def encode(self, wav: jax.Array, num_quantizers: int = 8) -> jax.Array:
        z = self.encoder(wav)
        return self.quantizer.encode(z, num_quantizers)

    def decode(self, codes: jax.Array) -> jax.Array:
        z = self.quantizer.decode(codes)
        return self.decoder(z)

    # ---- training-path methods (used by codec/losses.py) ----

    def encode_latents(self, wav: jax.Array) -> jax.Array:
        return self.encoder(wav)

    def quantize_latents(self, z: jax.Array, num_quantizers: int = 8):
        codes = self.quantizer.encode(z, num_quantizers)
        return self.quantizer.decode(codes), codes

    def decode_latents(self, z: jax.Array) -> jax.Array:
        return self.decoder(z)

    def __call__(self, wav: jax.Array, num_quantizers: int = 8):
        codes = self.encode(wav, num_quantizers)
        return self.decode(codes), codes


class Codec:
    """Host-facing cached codec (≡ the ``@cache``d ``_load_model`` +
    ``encode``/``decode`` helpers in ``emb/qnt.py:18-76``)."""

    def __init__(self, params=None, rng_seed: int = 0):
        self.model = EncodecModel()
        if params is None:
            params = self._init_params(rng_seed)
            self.pretrained = False
        else:
            # Loaded checkpoints arrive as host numpy arrays; pin them on
            # device once or every encode/decode call re-transfers the
            # full parameter set (measured ~6× per-call slowdown through
            # the TPU tunnel).
            params = jax.tree_util.tree_map(
                lambda x: jax.device_put(jnp.asarray(x, jnp.float32)), params
            )
            self.pretrained = True
        self.params = params
        self._encode = jax.jit(
            functools.partial(self.model.apply, method=EncodecModel.encode),
            static_argnames=("num_quantizers",),
        )
        self._decode = jax.jit(
            functools.partial(self.model.apply, method=EncodecModel.decode)
        )
        self._encode_latents = jax.jit(
            functools.partial(self.model.apply,
                              method=EncodecModel.encode_latents)
        )

    def _init_params(self, seed: int):
        rng = jax.random.PRNGKey(seed)
        wav = jnp.zeros((1, HOP * 4, 1), jnp.float32)
        return self.model.init(rng, wav)

    # ---------------- numpy-facing API (≡ emb/qnt.py) ----------------

    def encode(self, wav: np.ndarray, sr: int = SAMPLE_RATE,
               num_quantizers: int = 8) -> np.ndarray:
        """wav: (T,) or (C, T) float → codes (num_quantizers, frames) int32
        (≡ ``qnt.encode``, ``emb/qnt.py:56-69``)."""
        from ..audio.wavio import convert_audio

        wav = convert_audio(wav, sr, SAMPLE_RATE, target_channels=1)  # (T,)
        x = jnp.asarray(wav, jnp.float32)[None, :, None]
        codes = self._encode(self.params, x, num_quantizers=num_quantizers)
        return np.asarray(codes[0])

    def encode_latents(self, wav: np.ndarray, sr: int = SAMPLE_RATE
                       ) -> np.ndarray:
        """wav: (T,) or (C, T) float → pre-quantization latents
        (frames, dim) float32.  Used by codebook calibration
        (``codec/calibrate.py``) and codec training."""
        from ..audio.wavio import convert_audio

        wav = convert_audio(wav, sr, SAMPLE_RATE, target_channels=1)
        x = jnp.asarray(wav, jnp.float32)[None, :, None]
        z = self._encode_latents(self.params, x)
        return np.asarray(z[0])

    def decode(self, codes: np.ndarray) -> tuple[np.ndarray, int]:
        """codes: (Q, frames) → (wav float (T,), sr), or batched
        (B, Q, frames) → (wav float (B, T), sr)
        (≡ ``qnt.decode``, ``emb/qnt.py:32-43``)."""
        c = jnp.asarray(codes, jnp.int32)
        batched = c.ndim == 3
        if not batched:
            c = c[None]
        wav = self._decode(self.params, c)
        wav = np.asarray(wav[..., 0])
        return (wav if batched else wav[0]), SAMPLE_RATE


_cached: Codec | None = None


def load_codec(weights_path: str | Path | None = None) -> Codec:
    """Cached codec singleton.  Looks for converted weights at
    ``weights_path`` or ``$ENCODEC_WEIGHTS`` / ``zoo/encodec_24khz.npz``."""
    global _cached
    if _cached is not None:
        return _cached
    import os

    candidates = [
        weights_path,
        os.environ.get("ENCODEC_WEIGHTS"),
        "zoo/encodec_24khz.npz",
        # repo-root fallback so serving finds the installed codec from any cwd
        Path(__file__).resolve().parents[2] / "zoo/encodec_24khz.npz",
    ]
    params = None
    for cand in candidates:
        if cand and Path(cand).exists():
            from .convert import load_npz_params

            params = load_npz_params(cand)
            _logger.info(f"Loaded codec weights from {cand}")
            break
    if params is None:
        _logger.warning(
            "No pretrained codec weights found — using random init. "
            "Convert the published EnCodec checkpoint with "
            "python -m tts_with_diffusion_model_tpu.codec.convert <ckpt.th>."
        )
    _cached = Codec(params)
    return _cached


def unload_codec():
    """≡ ``qnt.unload_model`` (``emb/qnt.py:28``)."""
    global _cached
    _cached = None
