"""Codec preprocessor CLI + helpers (≡ ``vall_e/emb/qnt.py``).

``python -m tts_with_diffusion_model_tpu.emb.qnt <folder> [--suffix .wav]``
walks the folder, EnCodec-encodes every wav on the TPU, and writes
``<stem>.qnt.npy`` (int16 ``(8, frames)``) next to it — the rebuild's native
artifact format (``.qnt.pt`` files produced by the reference are also read
by the data pipeline).
"""

from __future__ import annotations

import argparse
import random
from pathlib import Path

import numpy as np

from ..audio.wavio import read_wav, write_wav
from ..codec.encodec import load_codec, unload_codec  # noqa: F401 (re-export)


def encode(wav: np.ndarray, sr: int) -> np.ndarray:
    """wav (C, T) or (T,) float → codes (8, frames) int (≡ ``qnt.encode``)."""
    return load_codec().encode(wav, sr)


def decode(codes: np.ndarray) -> tuple[np.ndarray, int]:
    """codes (q, t) or (b, q, t) → (wav, sr) (≡ ``qnt.decode``)."""
    return load_codec().decode(codes)


def encode_from_file(path: str | Path) -> np.ndarray:
    wav, sr = read_wav(path)
    if wav.shape[0] == 2:
        wav = wav[:1]
    return encode(wav, sr)


def decode_to_file(resps: np.ndarray, path: str | Path):
    """resps: (t, q) codes → wav file (≡ ``qnt.decode_to_file``)."""
    assert resps.ndim == 2, f"Require shape (t, q), got {resps.shape}."
    wav, sr = decode(np.asarray(resps).T)
    write_wav(path, wav, sr)


def _replace_file_extension(path: Path, suffix: str) -> Path:
    return (path.parent / path.name.split(".")[0]).with_suffix(suffix)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("folder", type=Path)
    parser.add_argument("--suffix", default=".wav")
    args = parser.parse_args()

    paths = [*args.folder.rglob(f"*{args.suffix}")]
    random.shuffle(paths)

    for path in paths:
        out_path = _replace_file_extension(path, ".qnt.npy")
        if out_path.exists():
            continue
        codes = encode_from_file(path)
        np.save(out_path, codes.astype(np.int16))
        print(out_path)


if __name__ == "__main__":
    main()
    # final statement: dodge the axon-tunnel teardown wedge
    # (utils/helpers.hard_exit_if_tunnel docstring); no-op off-tunnel
    from tts_with_diffusion_model_tpu.utils.helpers import (  # noqa: E402
        hard_exit_if_tunnel,
    )

    hard_exit_if_tunnel()
