#!/usr/bin/env python
"""Multi-speaker synthetic TTS corpus with acoustically real speaker identity.

Round-4 generalization evidence: the framework needs a corpus where
(a) speaker identity is an *acoustic* property carried by the waveform — not
just a directory name — and (b) the text deterministically controls the
audible content.  A model trained on the 95% split can then only score on
the held-out 5% by generalizing the text→melody mapping, and can only
benefit from the prompt by reading timbre out of it.  This is the synthetic
analogue of the zero-shot TTS setting the reference trains on LibriTTS for
(``/root/reference/config/LibriTTS/ar.yml``, split machinery
``/root/reference/vall_e/data.py:216-241``, prompt sampling
``data.py:136-155``).

Speaker model (what the prompt must carry):
  - base F0, log-spaced across speakers (~105..285 Hz) with per-speaker
    jitter — no two speakers share a pitch range;
  - a 3-formant spectral envelope (speaker-specific centre frequencies and
    bandwidths in vowel-like ranges) plus spectral tilt — the "vocal tract";
  - vibrato rate and depth.

Text model (what the phoneme stream must carry):
  - a fixed word vocabulary; every word maps via crc32 (stable across runs
    and Python versions) to 1..3 "syllable notes" — (semitone offset,
    relative duration) pairs;
  - an utterance's melody is the concatenation of its words' notes, scaled
    to one of four fixed total durations (4 wav lengths ⇒ 4 XLA encode
    compilations, not 768); the duration itself is crc32(text)-derived,
    so text fully determines pacing.

The corpus is **deterministic given (speaker, text)** — no per-utterance
randomness survives into the waveform (fixed Schroeder harmonic phases,
text-derived duration).  That property is load-bearing: the held-out
token-accuracy measurement is only meaningful if an oracle model *could*
score 1.0.  Same text → same relative melody for every speaker; same
speaker → same timbre and pitch base for every text.  Disentangling the
two is exactly the zero-shot task.

Usage: python scripts/make_gen_corpus.py OUTDIR [--speakers 32] [--utts 24]
Writes OUTDIR/spk{i:02d}/utt{j:03d}.wav + .normalized.txt, then run the
repo's own preprocessors (emb.g2p, emb.qnt) on OUTDIR.
"""

from __future__ import annotations

import argparse
import wave
import zlib
from pathlib import Path

import numpy as np

SR = 24_000
HOP = 320  # codec hop: durations are quantized to whole frame counts

#: Fixed utterance durations (frames) — 4 shapes ⇒ 4 codec compilations.
DUR_FRAMES = (96, 120, 144, 168)  # 1.28 / 1.60 / 1.92 / 2.24 s

#: Word vocabulary.  Real words so the G2P frontend produces a natural
#: phone inventory; melody comes from the crc32 of the word, so the phone
#: sequence (a deterministic function of the word) fully determines it.
VOCAB = [
    "anchor", "bright", "copper", "drift", "ember", "fable", "glide",
    "harbor", "island", "jasper", "kettle", "lumen", "marble", "north",
    "orbit", "pepper", "quiver", "river", "stone", "timber", "under",
    "velvet", "willow", "yonder", "zephyr", "amber", "birch", "cedar",
    "dune", "elm", "fern", "grove", "hazel", "iris", "juniper", "lark",
    "maple", "oak", "pine", "reed",
]


def _word_notes(word: str) -> list[tuple[float, float]]:
    """word → [(semitone offset, relative duration)], stable across runs."""
    rng = np.random.default_rng(zlib.crc32(word.encode()))
    n = int(rng.integers(1, 4))
    semis = rng.uniform(-5.0, 7.0, size=n)
    rels = rng.uniform(0.6, 1.4, size=n)
    return list(zip(semis.tolist(), rels.tolist()))


def speaker_params(i: int) -> dict:
    """Acoustic identity of speaker ``i`` (deterministic)."""
    rng = np.random.default_rng(7_000 + i)
    # log-spaced base F0 with jitter; adjacent speakers stay distinct
    f0 = 105.0 * (2.0 ** (1.45 * i / 31.0)) * float(rng.uniform(0.97, 1.03))
    return {
        "f0": f0,
        # vowel-ish formant ranges; widths give each speaker a different
        # spectral envelope even at matching harmonic frequencies
        "formants": [
            float(rng.uniform(320.0, 900.0)),
            float(rng.uniform(1000.0, 2400.0)),
            float(rng.uniform(2600.0, 3900.0)),
        ],
        "fwidths": [
            float(rng.uniform(60.0, 140.0)),
            float(rng.uniform(120.0, 260.0)),
            float(rng.uniform(200.0, 400.0)),
        ],
        "fgains": [1.0, float(rng.uniform(0.4, 0.9)),
                   float(rng.uniform(0.15, 0.5))],
        "tilt": float(rng.uniform(0.55, 0.85)),  # per-harmonic decay
        "vib_rate": float(rng.uniform(4.0, 7.0)),
        "vib_depth": float(rng.uniform(0.005, 0.02)),
    }


def _envelope(spk: dict, freqs: np.ndarray) -> np.ndarray:
    """Spectral envelope (formant bumps + floor) evaluated at ``freqs``."""
    env = np.full_like(freqs, 0.05)
    for fc, bw, g in zip(spk["formants"], spk["fwidths"], spk["fgains"]):
        env = env + g * np.exp(-0.5 * ((freqs - fc) / bw) ** 2)
    return env


def utterance_text(spk_i: int, utt_j: int, n_words_rng) -> str:
    """3-5 vocabulary words; per-(speaker, utterance) deterministic draw."""
    rng = np.random.default_rng(100_000 + spk_i * 1_000 + utt_j)
    n = int(rng.integers(3, 6))
    idx = rng.choice(len(VOCAB), size=n, replace=False)
    return " ".join(VOCAB[k] for k in idx)


def duration_frames(text: str) -> int:
    """Total duration as a *deterministic function of the text* (crc32 →
    one of the 4 fixed lengths).  If duration were drawn per utterance the
    held-out task would be unlearnable: the model cannot know an unseen
    utterance's random length, and a melody scaled to the wrong total
    misaligns every frame, flooring token accuracy at chance."""
    return DUR_FRAMES[zlib.crc32(("dur:" + text).encode()) % len(DUR_FRAMES)]


def synth_utterance(spk: dict, text: str, total_frames: int) -> np.ndarray:
    """Additive harmonic synthesis of ``text`` in ``spk``'s voice.

    Fully deterministic given (speaker, text, total_frames): harmonic
    phases follow a fixed Schroeder-style schedule (low crest factor, no
    RNG).  Per-utterance random phases would make held-out codec tokens
    unpredictable *in principle* — the val-split token accuracy this
    corpus exists to measure would be chance for a perfect model."""
    notes = [n for w in text.split() for n in _word_notes(w)]
    rels = np.array([r for _, r in notes])
    # distribute total_frames across notes proportionally (≥4 frames each)
    frames = np.maximum(4, np.round(rels / rels.sum() * total_frames))
    while frames.sum() > total_frames:
        frames[int(np.argmax(frames))] -= 1
    while frames.sum() < total_frames:
        frames[int(np.argmin(frames))] += 1

    out = np.zeros(total_frames * HOP, np.float64)
    pos = 0
    K = 14  # harmonics
    for (semi, _), nf in zip(notes, frames.astype(int)):
        n = nf * HOP
        t = np.arange(n) / SR
        f0 = spk["f0"] * 2.0 ** (semi / 12.0)
        f0_t = f0 * (1.0 + spk["vib_depth"]
                     * np.sin(2 * np.pi * spk["vib_rate"] * t))
        phase = 2 * np.pi * np.cumsum(f0_t) / SR
        seg = np.zeros(n)
        harm = np.arange(1, K + 1)
        amps = _envelope(spk, harm * f0) * (spk["tilt"] ** (harm - 1))
        for k, a in zip(harm, amps):
            if k * f0 > SR / 2 - 200:
                break
            # Schroeder phases: deterministic, spreads energy in time
            seg += a * np.sin(k * phase + np.pi * k * (k + 1) / K)
        # 10 ms attack/decay ramps avoid clicks at note boundaries
        ramp = min(int(0.010 * SR), n // 4)
        env = np.ones(n)
        env[:ramp] = np.linspace(0, 1, ramp)
        env[-ramp:] = np.linspace(1, 0, ramp)
        out[pos:pos + n] = seg * env
        pos += n
    out *= 0.35 / max(np.abs(out).max(), 1e-9)
    return out.astype(np.float32)


def write_wav_int16(path: Path, wav: np.ndarray):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((wav * 32767).astype("<i2").tobytes())


def generate(outdir: Path, n_speakers: int = 32, n_utts: int = 24,
             verbose: bool = True):
    outdir.mkdir(parents=True, exist_ok=True)
    for i in range(n_speakers):
        spk = speaker_params(i)
        spk_dir = outdir / f"spk{i:02d}"
        spk_dir.mkdir(exist_ok=True)
        for j in range(n_utts):
            text = utterance_text(i, j, None)
            dur = duration_frames(text)
            wav = synth_utterance(spk, text, dur)
            write_wav_int16(spk_dir / f"utt{j:03d}.wav", wav)
            (spk_dir / f"utt{j:03d}.normalized.txt").write_text(text)
        if verbose:
            print(f"spk{i:02d}: f0={spk['f0']:.1f} Hz, "
                  f"formants={[round(f) for f in spk['formants']]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", type=Path)
    ap.add_argument("--speakers", type=int, default=32)
    ap.add_argument("--utts", type=int, default=24)
    args = ap.parse_args()
    generate(args.outdir, args.speakers, args.utts)
    print(f"wrote {args.speakers * args.utts} utterances to {args.outdir}")


if __name__ == "__main__":
    main()
