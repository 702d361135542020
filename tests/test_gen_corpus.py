"""Synthetic generalization corpus (scripts/make_gen_corpus.py): the
round-4 evidence rests on speaker identity being *acoustic* and text
deterministically driving content — pin both properties, plus the
determinism that makes the corpus reproducible across machines."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from make_gen_corpus import (  # noqa: E402
    DUR_FRAMES,
    HOP,
    SR,
    _word_notes,
    duration_frames,
    speaker_params,
    synth_utterance,
    utterance_text,
)


def test_word_notes_stable_and_text_deterministic():
    # crc32-derived: stable across runs/processes (unlike hash())
    assert _word_notes("anchor") == _word_notes("anchor")
    assert _word_notes("anchor") != _word_notes("bright")
    assert utterance_text(3, 7, None) == utterance_text(3, 7, None)
    assert utterance_text(3, 7, None) != utterance_text(3, 8, None)


def test_speaker_params_distinct_and_ordered_f0():
    ps = [speaker_params(i) for i in range(32)]
    f0s = [p["f0"] for p in ps]
    # log-spaced and strictly increasing modulo jitter: spread is wide
    assert max(f0s) / min(f0s) > 2.0
    # no two speakers share formant layouts
    sigs = {tuple(round(f) for f in p["formants"]) for p in ps}
    assert len(sigs) == 32


def test_synth_is_deterministic_and_framed():
    spk = speaker_params(0)
    text = utterance_text(0, 0, None)
    for dur in DUR_FRAMES[:2]:
        a = synth_utterance(spk, text, dur)
        b = synth_utterance(spk, text, dur)
        np.testing.assert_array_equal(a, b)
        assert a.shape == (dur * HOP,)
        assert np.abs(a).max() <= 0.36  # normalized


def test_wav_is_a_function_of_speaker_and_text_only():
    """No per-utterance randomness survives into the waveform: the
    held-out token-accuracy measurement is only meaningful if an oracle
    could score 1.0, which requires wav == f(speaker, text).  Duration is
    crc32(text)-derived, so it is part of that function."""
    spk = speaker_params(4)
    text = utterance_text(4, 2, None)
    dur = duration_frames(text)
    assert dur in DUR_FRAMES
    assert duration_frames(text) == dur  # stable
    # same (speaker, text) synthesized "as a different utterance slot"
    # is bit-identical — there is no utterance-indexed state left
    a = synth_utterance(spk, text, dur)
    b = synth_utterance(speaker_params(4), text, duration_frames(text))
    np.testing.assert_array_equal(a, b)
    # duration varies across texts (all four lengths reachable)
    durs = {duration_frames(utterance_text(i, j, None))
            for i in range(8) for j in range(8)}
    assert len(durs) >= 3


def _f0_autocorr(wav, lo_hz=60, hi_hz=600):
    """F0 of a mid-utterance window via the autocorrelation peak (the
    dominant FFT bin tracks formants, not pitch)."""
    w = wav[len(wav) // 2: len(wav) // 2 + int(0.05 * SR)]
    ac = np.correlate(w, w, "full")[len(w) - 1:]
    lags = np.arange(len(ac))
    lo, hi = int(SR / hi_hz), int(SR / lo_hz)
    lag = lo + int(ac[lo:hi].argmax())
    return SR / lags[lag]


def test_speaker_identity_is_audible():
    """Same text, two speakers → pitch scale differs (base F0 is a speaker
    property); same speaker, two texts → waveform differs (melody is a
    text property)."""
    text = utterance_text(0, 0, None)
    lo = synth_utterance(speaker_params(0), text, 96)
    hi = synth_utterance(speaker_params(31), text, 96)
    # speaker 31's base F0 is ~2.7x speaker 0's; note offsets are at most
    # ±7 semitones (1.5x), so pitch ordering survives any melody
    assert _f0_autocorr(hi) > _f0_autocorr(lo) * 1.3

    t2 = utterance_text(0, 1, None)
    a = synth_utterance(speaker_params(0), text, 96)
    b = synth_utterance(speaker_params(0), t2, 96)
    assert not np.array_equal(a, b)


def test_generate_writes_corpus_layout(tmp_path):
    from make_gen_corpus import generate

    generate(tmp_path, n_speakers=2, n_utts=3, verbose=False)
    wavs = sorted(tmp_path.rglob("*.wav"))
    txts = sorted(tmp_path.rglob("*.normalized.txt"))
    assert len(wavs) == 6 and len(txts) == 6
    assert (tmp_path / "spk00" / "utt000.wav").exists()
    # texts are non-empty vocabulary words
    for t in txts:
        words = t.read_text().split()
        assert 3 <= len(words) <= 5
