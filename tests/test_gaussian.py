"""Continuous Gaussian DDPM family tests (the reference's variant snapshots):
closed-form term identities, q_sample/p_sample behavior, domain codecs, and
the end-to-end loss/generate of both domains."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from tts_with_diffusion_model_tpu.diffusion.gaussian import (
    GaussianDiffusion,
    denormalize_tokens,
    nearest_embedding,
    normalize_tokens,
)
from tts_with_diffusion_model_tpu.models.gaussian_tts import (
    GaussianConfig,
    GaussianDiffusionModel,
)

T = 10


def test_closed_form_terms():
    g = GaussianDiffusion.create(T, "linear", start=1e-4, stop=0.02)
    np.testing.assert_allclose(
        np.asarray(g.alphas), 1 - np.asarray(g.betas), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(g.alphas_cumprod),
        np.cumprod(np.asarray(g.alphas)),
        rtol=1e-5,
    )
    assert float(g.alphas_cumprod_prev[0]) == 1.0
    # posterior variance positive and < beta
    pv = np.asarray(g.posterior_variance)
    assert (pv[1:] > 0).all() and (pv <= np.asarray(g.betas) + 1e-7).all()


def test_q_sample_interpolates():
    g = GaussianDiffusion.create(T, "cosine")
    x0 = jnp.ones((2, 4, 3))
    noise = jnp.zeros_like(x0)
    # with zero noise, x_t = sqrt(ᾱ_t)·x₀
    t = jnp.array([0, T - 1])
    xt = g.q_sample(x0, t, noise)
    np.testing.assert_allclose(
        np.asarray(xt[0]).mean(), float(g.sqrt_alphas_cumprod[0]), rtol=1e-5
    )
    assert float(xt[1].mean()) < float(xt[0].mean())  # more signal decay later


def test_p_sample_t0_deterministic():
    g = GaussianDiffusion.create(T, "cosine")
    x_t = jnp.ones((1, 4, 2))
    eps = jnp.zeros_like(x_t)
    z = 100.0 * jnp.ones_like(x_t)  # huge noise must be ignored at t=0
    out = g.p_sample(eps, x_t, jnp.array([0]), z)
    expected = float(g.sqrt_recip_alphas[0])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_value_domain_roundtrip():
    V = 1024
    ids = jnp.array([[0, 1, 512, 1023]])
    x = normalize_tokens(ids, V)
    assert float(x.min()) == -1.0 and float(x.max()) == 1.0
    back = denormalize_tokens(x, V)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(ids))


def test_nearest_embedding_exact():
    table = jax.random.normal(jax.random.PRNGKey(0), (32, 8)) * 5
    idx = nearest_embedding(table[jnp.array([3, 7])], table)
    np.testing.assert_array_equal(np.asarray(idx), [3, 7])


def _tiny_cfg(domain):
    return GaussianConfig(
        n_tokens=64, d_model=16, n_heads=2, n_layers=1, timesteps=6,
        resp_len=12, text_len=5, prom_len=7, gen_len=9, domain=domain,
    )


def _batch(rng, V=64, resp_len=12):
    B = 2
    return dict(
        text=jax.random.randint(rng, (B, 5), 1, V),
        text_mask=jnp.ones((B, 5)),
        proms=jax.random.randint(rng, (B, 7, 8), 0, V),
        prom_mask=jnp.ones((B, 7)),
        resp=jax.random.randint(rng, (B, resp_len), 0, V),
        resp_mask=jnp.ones((B, resp_len)).at[1, resp_len - 3 :].set(0),
    )


def test_gaussian_model_embedding_domain():
    m = GaussianDiffusionModel(_tiny_cfg("embedding"), dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = m.init(rng)
    loss, stats = m.loss(params, _batch(rng), rng)
    assert jnp.isfinite(loss)
    b = _batch(rng)
    out = m.generate(params, b["text"], b["text_mask"], b["proms"],
                     b["prom_mask"], rng)
    assert out.shape == (2, 12)
    assert int(out[:, 9:].sum()) == 0
    assert 0 <= int(out.min()) and int(out.max()) < 65


def test_gaussian_remat_is_exact():
    """Per-block gradient checkpointing must not change loss or grads
    (same contract as the D3PM denoiser's remat, models/dit.py)."""
    import dataclasses

    cfg = _tiny_cfg("embedding")
    m0 = GaussianDiffusionModel(cfg, dtype=jnp.float32)
    m1 = GaussianDiffusionModel(
        dataclasses.replace(cfg, remat=True), dtype=jnp.float32
    )
    rng = jax.random.PRNGKey(2)
    params = m0.init(rng)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        m1.init(rng)
    )
    batch = _batch(rng)
    g0 = jax.grad(lambda p: m0.loss(p, batch, rng)[0])(params)
    g1 = jax.grad(lambda p: m1.loss(p, batch, rng)[0])(params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-6


def test_gaussian_model_value_domain():
    m = GaussianDiffusionModel(_tiny_cfg("value"), dtype=jnp.float32)
    rng = jax.random.PRNGKey(1)
    params = m.init(rng)
    loss, _ = m.loss(params, _batch(rng), rng)
    assert jnp.isfinite(loss)
    b = _batch(rng)
    out = m.generate(params, b["text"], b["text_mask"], b["proms"],
                     b["prom_mask"], rng)
    assert out.shape == (2, 12)
    assert int(out.min()) >= 0 and int(out.max()) < 64


def test_registry_dispatch():
    from tts_with_diffusion_model_tpu.models import get_model
    from tts_with_diffusion_model_tpu.models.diffusion import DiffusionModel

    assert isinstance(get_model("diffusion"), DiffusionModel)
    m = get_model("diffusion-gaussian", num_tokens=64)
    assert m.config.domain == "embedding"
    m = get_model("diffusion-gaussian-value", num_tokens=64)
    assert m.config.domain == "value"


@pytest.mark.slow
def test_gaussian_unet_shaped_denoiser():
    """ar-3-style U-Net bottleneck: down-projection → DiT core → up with
    skips; loss + generate run end-to-end."""
    cfg = GaussianConfig(
        n_tokens=64, d_model=32, n_heads=2, n_layers=1, timesteps=6,
        resp_len=12, text_len=5, prom_len=7, gen_len=9, domain="embedding",
        unet_dims=(16, 8),
    )
    m = GaussianDiffusionModel(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(2)
    params = m.init(rng)
    # core DiT runs at the bottleneck width
    dit_kernel = params["params"]["dit_0"]["attn"]["q"]["kernel"]
    import flax.linen as fnn
    assert fnn.meta.unbox(dit_kernel).shape == (8, 8)
    b = _batch(rng)
    loss, _ = m.loss(params, b, rng)
    assert jnp.isfinite(loss)
    out = m.generate(params, b["text"], b["text_mask"], b["proms"],
                     b["prom_mask"], rng)
    assert out.shape == (2, 12)


def test_registry_unet_variant():
    from tts_with_diffusion_model_tpu.models import get_model

    m = get_model("diffusion-gaussian-unet", num_tokens=64)
    assert m.config.unet_dims == (128, 64)


@pytest.mark.slow
def test_conv_unet_denoiser_value_domain():
    """ar-last's conv-UNet denoiser (``ar-last.py:186``): loss + generate run
    end-to-end in the value domain; masked tail stays zero; gradients flow
    to every parameter group."""
    cfg = GaussianConfig(
        n_tokens=64, d_model=32, n_heads=2, timesteps=6,
        resp_len=16, text_len=5, prom_len=7, gen_len=12, domain="value",
        denoiser="conv-unet", unet_channels=(8, 16),
    )
    m = GaussianDiffusionModel(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(3)
    params = m.init(rng)
    b = _batch(rng, resp_len=16)
    loss, _ = m.loss(params, b, rng)
    assert jnp.isfinite(loss)

    grads = jax.grad(lambda p: m.loss(p, b, rng)[0])(params)
    import flax

    flat = flax.traverse_util.flatten_dict(
        flax.linen.meta.unbox(grads["params"]), sep="/"
    )
    groups = {k.split("/")[0] for k, v in flat.items()
              if float(jnp.abs(v).sum()) > 0}
    assert any(k.startswith("down_res") for k in groups)
    assert any(k.startswith("up_res") for k in groups)
    assert "mid_attn" in groups and "conv_out" in groups

    out = m.generate(params, b["text"], b["text_mask"], b["proms"],
                     b["prom_mask"], rng)
    assert out.shape == (2, 16)
    assert int(out[:, 12:].sum()) == 0
    assert int(out.min()) >= 0 and int(out.max()) < 64


def test_registry_unet2d_variant():
    from tts_with_diffusion_model_tpu.models import get_model

    m = get_model("diffusion-gaussian-unet2d", num_tokens=64)
    assert m.config.denoiser == "conv-unet"
    assert m.config.domain == "value"
    assert m.config.unet_dims == ()


def test_conv_unet_masked_norm_bucket_invariant():
    """MaskedGroupNorm (ADVICE r2): normalization statistics cover valid
    frames only, so the same utterance produces identical denoiser outputs
    at its valid frames regardless of how much padding the resp bucket
    adds (16-frame vs 32-frame bucket, 12 valid frames)."""
    import numpy as np

    from tts_with_diffusion_model_tpu.models.unet import ConvUNetDenoiser

    den = ConvUNetDenoiser(
        in_dim=4, d_model=16, n_heads=2, n_classes=33, n_prom_levels=8,
        timesteps=6, channels=(8, 16), dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(11)
    r = np.random.default_rng(5)
    text = jnp.asarray(r.integers(1, 33, (1, 5)), jnp.int32)
    tm = jnp.ones((1, 5), jnp.float32)
    proms = jnp.asarray(r.integers(0, 33, (1, 7, 8)), jnp.int32)
    pm = jnp.ones((1, 7), jnp.float32)
    t = jnp.asarray([3], jnp.int32)

    valid = 12
    x16 = np.zeros((1, 16, 4), np.float32)
    x16[0, :valid] = r.normal(size=(valid, 4))
    m16 = np.zeros((1, 16), np.float32)
    m16[0, :valid] = 1

    params = den.init(rng, text, tm, proms, pm, jnp.asarray(x16),
                      jnp.asarray(m16), t)
    out16 = np.asarray(den.apply(
        params, text, tm, proms, pm, jnp.asarray(x16), jnp.asarray(m16), t
    ))

    x32 = np.zeros((1, 32, 4), np.float32)
    x32[0, :valid] = x16[0, :valid]
    m32 = np.zeros((1, 32), np.float32)
    m32[0, :valid] = 1
    out32 = np.asarray(den.apply(
        params, text, tm, proms, pm, jnp.asarray(x32), jnp.asarray(m32), t
    ))

    np.testing.assert_allclose(out32[0, :valid], out16[0, :valid],
                               rtol=1e-4, atol=1e-5)
    assert np.abs(out32[0, valid:]).sum() == 0


def test_gaussian_generate_row_key_isolation():
    """Per-row RNG contract (same as the D3PM): a row's tokens depend only
    on its own key, so batched serving cohorts can't change a request's
    audio (reference variants draw one global noise stream)."""
    from tts_with_diffusion_model_tpu.utils.rng import as_row_keys

    m = GaussianDiffusionModel(_tiny_cfg("embedding"), dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = m.init(rng)
    b = _batch(rng)
    keys = as_row_keys(jax.random.PRNGKey(42), 2)

    both = m.generate(params, b["text"], b["text_mask"], b["proms"],
                      b["prom_mask"], keys)
    solo = m.generate(params, b["text"][:1], b["text_mask"][:1],
                      b["proms"][:1], b["prom_mask"][:1], keys[:1])
    np.testing.assert_array_equal(np.asarray(both[:1]), np.asarray(solo))


def test_gaussian_bundle_cli_rebuild_and_generate(tmp_path):
    """Export → build_model round-trip for the continuous family: the CLI
    must rebuild the exact architecture from the bundle meta (a name
    starting with "diffusion" must NOT fall into the D3PM branch) and run
    its first stage."""
    from tts_with_diffusion_model_tpu.__main__ import (
        build_model,
        first_stage_generate,
    )
    from tts_with_diffusion_model_tpu.export import load_bundle, save_bundle

    cfg = _tiny_cfg("value")
    m = GaussianDiffusionModel(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(3)
    params = m.init(rng)
    meta = {
        "model": "diffusion-gaussian-value", "num_tokens": 64,
        "d_model": 16, "n_heads": 2, "n_layers": 1, "timesteps": 6,
        "resp_len": 12, "text_len": 5, "prom_len": 7, "gen_len": 9,
    }
    save_bundle(tmp_path / "g", params, meta, {"_": 1}, {})
    p2, meta2, _, _ = load_bundle(tmp_path / "g")
    m2 = build_model(meta2)
    assert isinstance(m2, GaussianDiffusionModel)
    assert m2.config == cfg

    import argparse
    args = argparse.Namespace(stride=1, max_ar_steps=8, temperature=1.0)
    out = first_stage_generate(
        meta2, m2, p2, [1, 2, 1], np.zeros((5, 8), np.int64), rng, args
    )
    assert out.shape == (9,)
