"""Model registry (≡ ``vall_e/vall_e/__init__.py:7-59``).

``get_model(name)`` dispatches on the name prefix — ``ar*`` / ``nar*`` /
``diffusion*`` — with the reference's size suffixes: ``-quarter``
(256/4/12), ``-half`` (512/8/12), default (1024/16/12).  The diffusion
branch uses the hyperparameters ``get_model("diffusion")`` hard-codes in the
reference (d_model 512, 100 steps, 8 heads; the reference then overrides
d_model to 32 inside the class — here 512 is honored, see ``models/dit.py``).
"""

from __future__ import annotations

from .ar import AR, ar_generate  # noqa: F401
from .nar import NAR, nar_generate  # noqa: F401
from .diffusion import DiffusionConfig, DiffusionModel  # noqa: F401
from .dit import DiTDenoiser  # noqa: F401


def get_model(
    name: str,
    num_tokens: int = 1024,
    overrides: dict | None = None,
    dtype=None,
):
    """Build a model from its registry name.

    ``overrides`` (optional) replaces individual hyperparameters — e.g.
    ``{"d_model": 64, "n_layers": 2}`` for tiny smoke-test models, or
    ``{"timesteps": 50}`` for a faster diffusion sampler.  ``dtype`` sets
    the compute precision (default bf16; ``cfg.use_fp16: false`` selects
    fp32 — the reference's fp16-toggle intent, ``vall_e/config.py:57-60``).
    """
    import jax.numpy as jnp

    name = name.lower()
    ov = dict(overrides or {})
    dtype = dtype if dtype is not None else jnp.bfloat16

    if name.startswith("diffusion-gaussian"):
        # The continuous-DDPM variant family the reference kept as snapshot
        # files (ar2/ar-dit = embedding domain; ar-4/ar-last = value domain).
        import dataclasses

        from .gaussian_tts import GaussianConfig, GaussianDiffusionModel

        if "unet2d-ref" in name:
            # ar-last's literal denoiser topology: diffusers
            # UNet2DConditionModel(448, block_out_channels=(320,640,1280,
            # 1280), encoder_hid_dim=448) re-expressed in Flax/NHWC
            # (models/unet2dcond.py; vall_e/vall_e/ar-last.py:186).
            domain, unet, denoiser = "value", (), "unet2d-ref"
        elif "unet2d" in name:
            # ar-last's conv-UNet denoiser (UNet2DConditionModel analogue,
            # models/unet.py); value domain by construction.
            domain, unet, denoiser = "value", (), "conv-unet"
        else:
            domain = "value" if name.endswith("value") else "embedding"
            # "-unet" selects the ar-3-style bottlenecked denoiser
            unet = (128, 64) if "unet" in name else ()
            denoiser = "dit"
        cfg = GaussianConfig(
            n_tokens=num_tokens, domain=domain, unet_dims=unet,
            denoiser=denoiser,
        )
        if denoiser == "unet2d-ref":
            # the published block widths (ar-last.py:186); overridable below
            cfg = dataclasses.replace(
                cfg, unet_channels=(320, 640, 1280, 1280), n_heads=8
            )
        valid = {f.name for f in dataclasses.fields(GaussianConfig)}
        cfg = dataclasses.replace(cfg, **{k: v for k, v in ov.items() if k in valid})
        return GaussianDiffusionModel(cfg, dtype=dtype)

    if name.startswith("diffusion"):
        import dataclasses

        cfg = DiffusionConfig(
            n_classes=num_tokens + 1,
            d_model=512,
            n_heads=8,
            n_layers=8,
            timesteps=100,
        )
        valid = {f.name for f in dataclasses.fields(DiffusionConfig)}
        cfg = dataclasses.replace(cfg, **{k: v for k, v in ov.items() if k in valid})
        return DiffusionModel(cfg, dtype=dtype)

    if name.startswith("ar"):
        Model = AR
    elif name.startswith("nar"):
        Model = NAR
    else:
        raise ValueError("Model name should start with AR or NAR.")

    if "-quarter" in name:
        dims = dict(d_model=256, n_heads=4, n_layers=12)
    elif "-half" in name:
        dims = dict(d_model=512, n_heads=8, n_layers=12)
    elif name in ["ar", "nar", "diffusion"]:
        dims = dict(d_model=1024, n_heads=16, n_layers=12)
    else:
        raise NotImplementedError(name)
    dims.update(
        {k: v for k, v in ov.items()
         if k in ("d_model", "n_heads", "n_layers", "remat", "remat_policy",
                  "attn_impl")}
    )
    return Model(num_tokens, dtype=dtype, **dims)
