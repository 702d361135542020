"""Codec-training tests: STFT loss sanity, VQ losses, straight-through
gradients, and a reconstruction-overfit convergence check."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tts_with_diffusion_model_tpu.codec.encodec import HOP, EncodecModel
from tts_with_diffusion_model_tpu.codec.losses import (
    codec_reconstruction_loss,
    multiscale_stft_loss,
    stft_mag,
    straight_through,
    vq_losses,
)


def test_stft_mag_tone_peak():
    sr, f = 24_000, 750.0
    t = np.arange(4096) / sr
    x = jnp.asarray(np.sin(2 * np.pi * f * t, dtype=np.float32))[None]
    mag = stft_mag(x, 1024, 256)
    bin_hz = sr / 1024
    peak = int(jnp.argmax(mag.mean(axis=1)[0]))
    assert abs(peak * bin_hz - f) < 2 * bin_hz


def test_multiscale_stft_loss_zero_for_identical():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4096)), jnp.float32)
    assert float(multiscale_stft_loss(x, x)) == pytest.approx(0.0, abs=1e-5)
    y = x + 0.5
    assert float(multiscale_stft_loss(x, y)) > 0.01


def test_vq_losses_and_straight_through_grad():
    z = jnp.array([[1.0, 2.0]])
    zq = jnp.array([[1.5, 1.5]])
    cb, commit = vq_losses(z, zq)
    assert float(cb) == pytest.approx(0.25)
    assert float(commit) == pytest.approx(0.25 * 0.25)

    # straight-through: gradient flows to z as identity
    g = jax.grad(lambda zz: straight_through(zz, jax.lax.stop_gradient(zq)).sum())(z)
    np.testing.assert_allclose(np.asarray(g), 1.0)


@pytest.mark.slow
def test_codec_reconstruction_overfit_tone():
    """A few hundred steps on one tone segment must substantially reduce the
    reconstruction loss (codec trainability check)."""
    model = EncodecModel(n_filters=4, dimension=16, n_q_total=4, bins=32)
    T = HOP * 8
    t = np.arange(T) / 24_000
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    batch = {"wav": jnp.asarray(wav)[None, :, None]}

    rng = jax.random.PRNGKey(0)
    params = model.init(rng, batch["wav"])
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss_fn(p):
        return codec_reconstruction_loss(model, p, batch["wav"], num_quantizers=2)

    @jax.jit
    def step(p, o):
        (l, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    first = None
    for i in range(150):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.7, (first, float(loss))


def test_wav_segment_loader(tmp_path):
    from tts_with_diffusion_model_tpu.audio.wavio import write_wav
    from tts_with_diffusion_model_tpu.codec.train import WavSegmentLoader

    sr = 24_000
    for i in range(3):
        tt = np.linspace(0, 0.5, sr // 2, endpoint=False)
        write_wav(tmp_path / f"w{i}.wav", 0.3 * np.sin(2 * np.pi * (200 + i * 50) * tt), sr)

    loader = WavSegmentLoader([tmp_path], batch_size=2, segment_frames=10)
    batch = next(iter(loader))
    assert batch["wav"].shape == (2, 10 * HOP, 1)
    assert batch["wav"].dtype == np.float32
