"""RVQ codebook calibration (codec/calibrate.py): residual k-means must
spread code usage and strictly reduce quantization error vs random init —
the property the air-gapped bootstrap relies on (the published EnCodec
does the same k-means init before EMA training; the reference sidesteps
it by downloading trained weights, ``/root/reference/vall_e/emb/qnt.py:18-25``).
"""

import numpy as np
import pytest

from tts_with_diffusion_model_tpu.codec.calibrate import (
    calibrate_codebooks,
    calibrate_codec_params,
    kmeans,
)


def _clustered_data(n_clusters=16, per=50, d=8, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)) * 4.0
    x = np.concatenate(
        [c + 0.1 * rng.standard_normal((per, d)) for c in centers])
    return x.astype(np.float32), centers


def test_kmeans_recovers_separated_clusters():
    # k-means++ seeding must recover well-separated clusters on every
    # seed — plain random init merges cluster pairs and Lloyd's cannot
    # split them apart again (the failure mode that motivated ++).
    x, centers = _clustered_data()
    for seed in range(3):
        cb = kmeans(x, k=16, iters=15, seed=seed)
        d = np.linalg.norm(centers[:, None, :] - cb[None, :, :], axis=-1)
        assert float(d.min(axis=1).max()) < 0.5, f"seed {seed}"

    # and regardless of seed, iterating must beat the raw init
    def inertia(cb):
        d2 = ((x[:, None, :] - cb[None]) ** 2).sum(-1)
        return float(d2.min(axis=1).mean())

    rng = np.random.default_rng(9)
    init = x[rng.choice(len(x), size=16, replace=False)]
    assert inertia(kmeans(x, k=16, iters=15, seed=9)) <= inertia(init)


def test_kmeans_deterministic_and_handles_small_n():
    x, _ = _clustered_data(per=4)  # 64 points
    a = kmeans(x, k=16, iters=5, seed=3)
    b = kmeans(x, k=16, iters=5, seed=3)
    np.testing.assert_array_equal(a, b)
    # k > n points: still returns k finite centroids
    tiny = kmeans(x[:5], k=16, iters=3, seed=0)
    assert tiny.shape == (16, x.shape[1]) and np.isfinite(tiny).all()


def _quant_error(x, codebooks, levels):
    res = x.copy()
    for q in range(levels):
        d = ((res[:, None, :] - codebooks[q][None]) ** 2).sum(-1)
        res = res - codebooks[q][d.argmin(1)]
    return float((res ** 2).mean())


def test_calibration_beats_random_init_and_spreads_usage():
    x, _ = _clustered_data(n_clusters=32, per=40, d=8, seed=1)
    rng = np.random.default_rng(0)
    random_cbs = rng.standard_normal((4, 64, 8)).astype(np.float32)
    calibrated = calibrate_codebooks(x, random_cbs, levels=3, iters=10)
    # untouched levels stay identical
    np.testing.assert_array_equal(calibrated[3], random_cbs[3])
    # error strictly improves at the calibrated depth
    assert _quant_error(x, calibrated, 3) < 0.25 * _quant_error(
        x, random_cbs, 3)
    # level-0 usage spreads beyond a handful of codes
    d = ((x[:, None, :] - calibrated[0][None]) ** 2).sum(-1)
    assert len(np.unique(d.argmin(1))) > 16


def test_calibrate_codec_params_swaps_only_codebooks():
    params = {
        "params": {
            "quantizer": {
                "codebooks": np.random.default_rng(0)
                .standard_normal((4, 32, 8)).astype(np.float32)
            },
            "encoder": {"w": np.ones((3,), np.float32)},
        }
    }
    x, _ = _clustered_data(n_clusters=8, per=30, d=8)
    new = calibrate_codec_params(params, x, levels=2, iters=5)
    np.testing.assert_array_equal(
        new["params"]["encoder"]["w"], params["params"]["encoder"]["w"])
    cbs_old = params["params"]["quantizer"]["codebooks"]
    cbs_new = new["params"]["quantizer"]["codebooks"]
    assert not np.array_equal(cbs_new[0], cbs_old[0])
    np.testing.assert_array_equal(cbs_new[2], cbs_old[2])
    # original tree untouched (deepcopy semantics)
    assert cbs_old is not cbs_new
