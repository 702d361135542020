"""ar-last's literal UNet2DConditionModel topology (models/unet2dcond.py).

Closes the one inventory row VERDICT r3 left partial: the diffusers
``UNet2DConditionModel(448, block_out_channels=(320,640,1280,1280),
encoder_hid_dim=448)`` denoiser of ``vall_e/vall_e/ar-last.py:186``,
re-expressed in Flax/NHWC behind the Gaussian family's registry."""

import flax
import jax
import jax.numpy as jnp
import numpy as np

from tts_with_diffusion_model_tpu.models.gaussian_tts import (
    GaussianConfig,
    GaussianDiffusionModel,
)
from tts_with_diffusion_model_tpu.models.unet2dcond import (
    UNet2DConditionNet,
    timestep_embedding,
)


def _batch(rng, V=64, resp_len=16):
    B = 2
    return dict(
        text=jax.random.randint(rng, (B, 5), 1, V),
        text_mask=jnp.ones((B, 5)),
        proms=jax.random.randint(rng, (B, 7, 8), 0, V),
        prom_mask=jnp.ones((B, 7)),
        resp=jax.random.randint(rng, (B, resp_len), 0, V),
        resp_mask=jnp.ones((B, resp_len)).at[1, resp_len - 3 :].set(0),
    )


def test_unet2d_topology_blocks():
    """The published block layout: cross-attn in down blocks 0-2 but not
    the last; mid = res/attn/res; up mirrors down (attn in up 1-3 only);
    per-block channel widths follow block_out_channels; 2 resnets per down
    block, 3 per up block; time MLP is 4x the base width."""
    net = UNet2DConditionNet(
        block_out_channels=(8, 16, 32, 32), n_heads=2, cross_dim=24,
        dtype=jnp.float32,
    )
    x = jnp.zeros((1, 1, 16, 1))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 2, 24))
    params = net.init(jax.random.PRNGKey(0), x, t, ctx)
    top = set(params["params"].keys())

    for i in range(3):
        assert f"down_{i}_attn_0" in top and f"down_{i}_attn_1" in top
        assert f"down_{i}_downsample" in top
    assert "down_3_attn_0" not in top and "down_3_downsample" not in top
    assert {"mid_res_0", "mid_attn", "mid_res_1"} <= top
    assert "up_0_attn_0" not in top  # UpBlock2D: resnets only
    for i in (1, 2, 3):
        assert f"up_{i}_attn_0" in top and f"up_{i}_attn_2" in top
    for i in range(4):
        assert f"up_{i}_res_2" in top  # layers_per_block + 1
    # channel widths: conv kernels are (kh, kw, in, out) in NHWC
    p = params["params"]
    assert p["conv_in"]["kernel"].shape[-1] == 8
    assert p["down_1_res_0"]["conv1"]["kernel"].shape[-1] == 16
    assert p["mid_res_0"]["conv1"]["kernel"].shape[-1] == 32
    assert p["up_3_res_0"]["conv1"]["kernel"].shape[-1] == 8
    assert p["time_dense1"]["kernel"].shape == (8, 32)
    assert p["conv_out"]["kernel"].shape[-1] == 1

    out = net.apply(params, x, t, ctx)
    assert out.shape == (1, 1, 16, 1)


def test_unet2d_timestep_embedding_halves():
    """flip_sin_to_cos layout: [cos | sin], max_period 1e4."""
    e = timestep_embedding(jnp.asarray([0, 3]), 8)
    np.testing.assert_allclose(np.asarray(e[0, :4]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e[0, 4:]), 0.0, atol=1e-6)
    freqs = np.exp(-np.log(1e4) * np.arange(4) / 4)
    np.testing.assert_allclose(np.asarray(e[1, :4]), np.cos(3 * freqs),
                               rtol=1e-5)


def test_unet2d_ref_denoiser_end_to_end():
    """Loss + generate through GaussianDiffusionModel in the value domain;
    masked tail stays zero; gradients reach the UNet core, both
    conditioning encoders, and the encoder_hid projection."""
    cfg = GaussianConfig(
        n_tokens=64, d_model=16, n_heads=2, timesteps=6,
        resp_len=16, text_len=5, prom_len=7, gen_len=12, domain="value",
        denoiser="unet2d-ref", unet_channels=(8, 16, 32, 32),
    )
    m = GaussianDiffusionModel(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(3)
    params = m.init(rng)
    b = _batch(rng)
    loss, _ = m.loss(params, b, rng)
    assert jnp.isfinite(loss)

    grads = jax.grad(lambda p: m.loss(p, b, rng)[0])(params)
    flat = flax.traverse_util.flatten_dict(
        flax.linen.meta.unbox(grads["params"]), sep="/"
    )
    groups = {k.split("/")[0] for k, v in flat.items()
              if float(jnp.abs(v).sum()) > 0}
    assert {"unet", "encoder2", "encodertext", "encoder_hid_proj",
            "condition1_proj", "condition2_proj"} <= groups

    out = m.generate(params, b["text"], b["text_mask"], b["proms"],
                     b["prom_mask"], rng)
    assert out.shape == (2, 16)
    assert int(out[:, 12:].sum()) == 0
    assert int(out.min()) >= 0 and int(out.max()) < 64


def test_registry_unet2d_ref_variant():
    from tts_with_diffusion_model_tpu.models import get_model

    m = get_model("diffusion-gaussian-unet2d-ref", num_tokens=64)
    assert m.config.denoiser == "unet2d-ref"
    assert m.config.domain == "value"
    assert tuple(m.config.unet_channels) == (320, 640, 1280, 1280)
    assert m.config.n_heads == 8
    # overrides still apply on top of the published widths
    m2 = get_model(
        "diffusion-gaussian-unet2d-ref", num_tokens=64,
        overrides={"unet_channels": (8, 16, 32, 32)},
    )
    assert tuple(m2.config.unet_channels) == (8, 16, 32, 32)
