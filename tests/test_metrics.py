"""Objective eval metrics (utils/metrics.py): token accuracy, mel cepstra,
DTW, and MCD — the numbers the eval loop logs alongside the reference's
wav dumps (``/root/reference/vall_e/train.py:90-145`` logs losses only)."""

import numpy as np
import pytest

from tts_with_diffusion_model_tpu.utils.metrics import (
    aggregate_metrics,
    eval_utterance_metrics,
    mel_cepstra,
    mel_cepstral_distortion,
    mel_filterbank,
    token_accuracy,
    _dtw_path,
)

SR = 24_000


def _tone(freq, seconds=0.4, sr=SR, phase=0.0):
    t = np.arange(int(seconds * sr)) / sr
    return np.sin(2 * np.pi * freq * t + phase).astype(np.float32)


# ---------------------------------------------------------------- tokens


def test_token_accuracy_identity_and_disjoint():
    ref = np.arange(24).reshape(8, 3) % 7
    assert token_accuracy(ref, ref)["acc"] == 1.0
    assert token_accuracy(ref + 1, ref)["acc"] == 0.0


def test_token_accuracy_per_level_and_len_ratio():
    ref = np.zeros((10, 2), np.int32)
    hyp = np.zeros((5, 2), np.int32)
    hyp[:, 1] = 9  # level 1 all wrong
    m = token_accuracy(hyp, ref)
    assert m["level0_acc"] == 1.0
    assert m["level1_acc"] == 0.0
    assert m["acc"] == 0.5
    assert m["len_ratio"] == 0.5


def test_token_accuracy_empty_hyp():
    m = token_accuracy(np.zeros((0, 8), np.int32), np.ones((4, 8), np.int32))
    assert m["acc"] == 0.0 and m["len_ratio"] == 0.0


def test_token_accuracy_teacher_levels_excluded_from_acc():
    # NAR setting: level 0 is teacher-provided (always correct by
    # construction), levels 1+ are generated.  'acc' must grade only the
    # generated levels — otherwise a guaranteed-perfect level inflates it.
    ref = np.zeros((10, 3), np.int32)
    hyp = np.zeros((10, 3), np.int32)
    hyp[:, 1] = 9   # generated level 1 all wrong
    hyp[:5, 2] = 9  # generated level 2 half wrong
    m = token_accuracy(hyp, ref, teacher_levels=1)
    assert m["level0_acc_teacher"] == 1.0
    assert "level0_acc" not in m
    assert m["level1_acc"] == 0.0
    assert m["level2_acc"] == 0.5
    assert m["acc"] == 0.25  # mean over levels 1-2 only

    # teacher_levels covering everything degenerates safely
    m_all = token_accuracy(hyp, ref, teacher_levels=5)
    assert m_all["acc"] == 0.0


# ---------------------------------------------------------------- cepstra


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(SR, 1024, 40)
    assert fb.shape == (40, 513)
    assert (fb >= 0).all()
    # every filter has support; interior bins are covered by some filter
    assert (fb.sum(axis=1) > 0).all()
    assert (fb[:, 5:-5].sum(axis=0) > 0).any()


def test_mel_cepstra_shape_and_determinism():
    wav = _tone(440)
    c = mel_cepstra(wav, SR)
    assert c.shape[1] == 13
    assert c.shape[0] > 10
    np.testing.assert_array_equal(c, mel_cepstra(wav, SR))


def test_mel_cepstra_distinguishes_frequencies():
    a = mel_cepstra(_tone(220), SR).mean(0)
    b = mel_cepstra(_tone(1760), SR).mean(0)
    assert np.linalg.norm(a - b) > 1.0


# ---------------------------------------------------------------- DTW


def test_dtw_identity_is_diagonal():
    x = np.random.default_rng(0).normal(size=(6, 3))
    cost = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    path = _dtw_path(cost)
    assert path == [(i, i) for i in range(6)]


def test_dtw_path_monotone_and_covers_ends():
    rng = np.random.default_rng(1)
    cost = rng.random((7, 11))
    path = _dtw_path(cost)
    assert path[0] == (0, 0) and path[-1] == (6, 10)
    for (i0, j0), (i1, j1) in zip(path, path[1:]):
        assert 0 <= i1 - i0 <= 1 and 0 <= j1 - j0 <= 1
        assert (i1 - i0) + (j1 - j0) >= 1


# ---------------------------------------------------------------- MCD


def test_mcd_zero_on_identical_signals():
    wav = _tone(330)
    m = mel_cepstral_distortion(wav, wav, SR)
    assert m["mcd"] == pytest.approx(0.0, abs=1e-9)
    assert m["frames"] > 0


def test_mcd_orders_degradation():
    ref = _tone(330) + 0.3 * _tone(990)
    rng = np.random.default_rng(2)
    slightly = ref + 0.01 * rng.normal(size=ref.shape)
    badly = ref + 0.5 * rng.normal(size=ref.shape)
    m_slight = mel_cepstral_distortion(slightly, ref, SR)["mcd"]
    m_bad = mel_cepstral_distortion(badly, ref, SR)["mcd"]
    assert 0 < m_slight < m_bad


def test_mcd_dtw_absorbs_time_offset():
    """A shifted copy should score far better than a different signal —
    the point of aligning with DTW instead of frame-by-frame."""
    ref = np.concatenate([_tone(330, 0.3), _tone(660, 0.3)])
    shifted = np.concatenate([np.zeros(2048, np.float32), ref])[: len(ref)]
    other = _tone(1234, 0.6)
    m_shift = mel_cepstral_distortion(shifted, ref, SR)["mcd"]
    m_other = mel_cepstral_distortion(other, ref, SR)["mcd"]
    assert m_shift < 0.5 * m_other


def test_mcd_empty_signal_is_inf_not_crash():
    m = mel_cepstral_distortion(np.zeros(0), _tone(330), SR)
    assert m["mcd"] == float("inf") or np.isfinite(m["mcd"])


# ---------------------------------------------------------------- plumbing


def test_eval_utterance_metrics_combines_fields():
    codes = np.arange(16).reshape(8, 2) % 5
    wav = _tone(440)
    m = eval_utterance_metrics(codes, codes, wav, wav, SR)
    assert m["acc"] == 1.0 and m["mcd"] == pytest.approx(0.0, abs=1e-9)


def test_aggregate_metrics_means_and_skips_nonfinite():
    rows = [
        {"acc": 1.0, "mcd": 2.0},
        {"acc": 0.0, "mcd": float("inf")},
    ]
    agg = aggregate_metrics(rows)
    assert agg["n_utts"] == 2
    assert agg["acc"] == 0.5
    assert agg["mcd"] == 2.0  # inf skipped


def test_aggregate_metrics_empty():
    assert aggregate_metrics([]) == {"n_utts": 0}


# ---------------------------------------------------------------- seams


def test_seam_flux_flags_hard_splice_not_smooth_join():
    from tts_with_diffusion_model_tpu.utils.metrics import seam_spectral_flux

    sr = SR
    half = int(0.5 * sr)
    # hard splice: different frequency AND phase-discontinuous amplitude
    a = _tone(300, seconds=0.5)
    b = 0.9 * _tone(1700, seconds=0.5, phase=1.3)
    spliced = np.concatenate([a, b])
    rough = seam_spectral_flux(spliced, sr, [half])
    # smooth "join": one continuous tone, boundary marked mid-signal
    smooth = seam_spectral_flux(_tone(300, seconds=1.0), sr, [half])
    assert rough["seam_flux_ratio_max"] > 3.0
    assert smooth["seam_flux_ratio_max"] < 2.0
    assert rough["seam_flux_ratio_max"] > 2 * smooth["seam_flux_ratio_max"]


def test_seam_flux_degenerate_inputs():
    from tts_with_diffusion_model_tpu.utils.metrics import seam_spectral_flux

    out = seam_spectral_flux(np.zeros(64), SR, [10])
    assert out["seam_flux_ratios"] == []
    # boundary beyond the signal is skipped, not an error
    out2 = seam_spectral_flux(_tone(440), SR, [10 ** 9])
    assert out2["seam_flux_ratios"] == []
