"""Codec training entrypoint: bootstrap an EnCodec-compatible codec on TPU.

``python -m tts_with_diffusion_model_tpu.codec.train yaml=<cfg>`` with
``data_dirs`` pointing at folders of wav files.  Trains the SEANet+RVQ
model (``codec/encodec.py``) with the reconstruction objective in
``codec/losses.py`` (multi-scale STFT + L1 + VQ terms) using the same
Engine/trainer runtime as the TTS models; saves checkpoints under
``ckpt_dir/codec`` and can export inference weights to ``zoo/``.

The reference has no codec training (it downloads pretrained weights,
``emb/qnt.py:18-25``); this makes the framework self-sufficient in
air-gapped deployments.
"""

from __future__ import annotations

import logging
import random
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.wavio import convert_audio, read_wav
from ..config import Config
from ..train.engine import Engine
from ..utils import setup_logging
from .encodec import HOP, EncodecModel
from .losses import codec_reconstruction_loss

_logger = logging.getLogger(__name__)


class WavSegmentLoader:
    """Infinite loader of fixed-length mono 24 kHz segments from wav files."""

    def __init__(self, data_dirs, batch_size: int, segment_frames: int = 150,
                 seed: int = 0):
        self.paths = []
        for d in data_dirs:
            self.paths.extend(Path(d).rglob("*.wav"))
        if not self.paths:
            raise RuntimeError(f"No wav files under {list(data_dirs)}")
        self.batch_size = batch_size
        self.segment_len = segment_frames * HOP
        self.rng = random.Random(seed)

    def _segment(self) -> np.ndarray:
        for _ in range(100):
            path = self.rng.choice(self.paths)
            wav, sr = read_wav(path)
            mono = convert_audio(wav, sr, 24_000, target_channels=1)
            if len(mono) >= self.segment_len:
                start = self.rng.randrange(0, len(mono) - self.segment_len + 1)
                return mono[start : start + self.segment_len]
            # short file: tile
            reps = int(np.ceil(self.segment_len / max(len(mono), 1)))
            return np.tile(mono, reps)[: self.segment_len]
        raise RuntimeError("could not draw a segment")

    def __iter__(self):
        while True:
            batch = np.stack([self._segment() for _ in range(self.batch_size)])
            yield {"wav": batch[..., None].astype(np.float32)}


def make_codec_loss_fn(model: EncodecModel, num_quantizers: int = 8):
    def loss_fn(params, batch, rng):
        return codec_reconstruction_loss(
            model, params, batch["wav"], num_quantizers=num_quantizers
        )

    return loss_fn


def train_codec(cfg: Config, segment_frames: int = 150, num_quantizers: int = 8):
    model = EncodecModel()
    rng = jax.random.PRNGKey(cfg.seed)
    params = model.init(rng, jnp.zeros((1, segment_frames * HOP, 1)))

    from ..parallel.mesh import build_mesh

    opt_cfg = dict(cfg.optimizer_cfg)
    opt_cfg["gradient_clipping"] = cfg.gradient_clipping
    engine = Engine(
        name="codec",
        init_params=params,
        loss_fn=make_codec_loss_fn(model, num_quantizers),
        opt_cfg=opt_cfg,
        ckpt_root=cfg.ckpt_dir,
        mesh=build_mesh(cfg.mesh_dp, cfg.mesh_tp),
    )
    engine.load_checkpoint()

    loader = WavSegmentLoader(
        cfg.data_dirs, cfg.batch_size, segment_frames, cfg.seed
    )
    save_every = cfg.save_ckpt_every or cfg.eval_every
    step_rng = jax.random.PRNGKey(cfg.seed + 1)
    for batch in loader:
        if engine.global_step >= cfg.max_iter:
            break
        step_rng, sub = jax.random.split(step_rng)
        stats = engine.train_batch(batch, sub)
        _logger.info(str({**stats, "global_step": engine.global_step}))
        if engine.global_step % save_every == 0:
            engine.save_checkpoint()
    engine.save_checkpoint()
    return engine


def main():
    cfg = Config.from_cli()
    setup_logging(cfg.log_dir)
    train_codec(cfg)


if __name__ == "__main__":
    main()
