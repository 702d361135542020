"""Continuous Gaussian-diffusion TTS model (the reference's variant family).

One first-class model covering the capabilities of the reference's
superseded continuous-diffusion snapshots (SURVEY §2.1 rows ``ar-1.py``,
``ar2.py``, ``ar-3.py``, ``ar-4.py``, ``ar-last.py``, ``ar-dit.py``,
``diffused_ar``): a DiT denoiser (reusing ``models/dit.py``'s blocks and
conditioning towers) predicting the noise ε over either

  - ``domain="embedding"``: resp token *embedding vectors*, decoded by
    nearest-embedding lookup (``ar2.py`` / ``ar-dit.py`` design), or
  - ``domain="value"``: *normalized integer token values* in [-1, 1],
    decoded by de-normalize + round (``ar-4.py`` / ``ar-last.py`` design).

Registry names: ``diffusion-gaussian`` (embedding) /
``diffusion-gaussian-value``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..diffusion.gaussian import (
    GaussianDiffusion,
    denormalize_tokens,
    nearest_embedding,
    normalize_tokens,
)
from .base import EMBED, VOCAB, resolve_remat_policy
from .dit import CondTower, DiTBlock, MultiEmbedding, sinusoidal_embedding


@dataclasses.dataclass(frozen=True)
class GaussianConfig:
    n_tokens: int = 1024
    d_model: int = 256
    n_heads: int = 8
    n_layers: int = 8
    n_prom_levels: int = 8
    timesteps: int = 100
    schedule: str = "cosine"
    domain: str = "embedding"  # "embedding" | "value"
    resp_len: int = 448
    text_len: int = 50
    prom_len: int = 398
    gen_len: int = 350
    # U-Net-shaped channel bottleneck around the DiT stack (the reference's
    # ``ar-3.py`` design: down-projection encoders → narrow DiT blocks →
    # up-projection, ``ar-3.py:212-252``).  Empty = plain DiT (ar-dit/ar-4).
    unet_dims: tuple = ()
    # Denoiser architecture: "dit" (default), "conv-unet" — the TPU-shaped
    # UNet2DConditionModel analogue of ``ar-last.py:186`` (value domain
    # only; see models/unet.py) — or "unet2d-ref", the literal published
    # topology (models/unet2dcond.py).
    denoiser: str = "dit"
    unet_channels: tuple = (64, 128, 256)
    # per-block gradient checkpointing in the DiT stack (training memory
    # lever; ≡ models/dit.py remat) — wired from cfg.gradient_checkpointing
    remat: bool = False
    remat_policy: str | None = None  # see models/base.py resolve_remat_policy


class GaussianDenoiser(nn.Module):
    """Continuous-input denoiser: Dense in-projection (instead of a token
    embedding), DiT blocks with text/speaker cross-attn + FiLM(t), Dense
    out-projection back to the diffusion domain width."""

    in_dim: int
    d_model: int
    n_heads: int
    n_layers: int
    n_classes: int
    n_prom_levels: int
    timesteps: int
    unet_dims: tuple = ()
    dtype: Any = jnp.bfloat16
    remat: bool = False
    remat_policy: str | None = None

    @property
    def core_dim(self) -> int:
        """Width of the DiT stack: the bottleneck when U-Net-shaped."""
        return self.unet_dims[-1] if self.unet_dims else self.d_model

    def setup(self):
        dt = self.dtype
        self.in_proj = nn.Dense(self.d_model, dtype=dt)
        # token ↔ embedding table for the "embedding" diffusion domain
        # (≡ the resp embedding ar2/ar-dit diffuse over and decode against
        # with find_closest_embedding, ``ar2.py:424+``)
        self.resp_table = self.param(
            "resp_table",
            nn.with_logical_partitioning(
                nn.initializers.normal(1.0), (VOCAB, EMBED)
            ),
            (self.n_classes, self.d_model),
        )
        if self.unet_dims:
            # ar-3-style down/up projection chains around the DiT core.
            self.down_projs = [nn.Dense(d, dtype=dt) for d in self.unet_dims]
            self.up_projs = [
                nn.Dense(d, dtype=dt)
                for d in list(reversed(self.unet_dims[:-1])) + [self.d_model]
            ]
        self.text_emb = nn.Embed(
            self.n_classes,
            self.d_model,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(1.0), (VOCAB, EMBED)
            ),
        )
        self.proms_emb = MultiEmbedding(
            self.n_prom_levels, self.n_classes, self.d_model
        )
        core = self.core_dim
        self.time_emb = nn.Embed(self.timesteps + 1, core)
        self.text_tower = CondTower(self.d_model, self.n_heads, mlp_mult=2,
                                    dtype=dt)
        self.prom_tower = CondTower(self.d_model, self.n_heads, mlp_mult=3,
                                    dtype=dt)
        if self.unet_dims:
            # conditioning into the bottleneck
            self.cond_proj = nn.Dense(core, dtype=dt)
        Block = (
            nn.remat(DiTBlock, policy=resolve_remat_policy(self.remat_policy))
            if self.remat else DiTBlock
        )
        self.blocks = [
            Block(core, self.n_heads, dtype=dt, name=f"dit_{i}")
            for i in range(self.n_layers)
        ]
        self.out_proj = nn.Dense(self.in_dim, dtype=jnp.float32)

    def conds(self, text, text_mask, proms, prom_mask):
        Tt, Tp = text.shape[1], proms.shape[1]
        te = self.text_emb(text) + sinusoidal_embedding(
            jnp.arange(Tt)[None], self.d_model
        )
        pe = self.proms_emb(proms) + sinusoidal_embedding(
            jnp.arange(Tp)[None], self.d_model
        )
        te = te.astype(self.dtype) * text_mask[..., None].astype(self.dtype)
        pe = pe.astype(self.dtype) * prom_mask[..., None].astype(self.dtype)
        return self.text_tower(te, text_mask), self.prom_tower(pe, prom_mask)

    def denoise(self, x_t, resp_mask, t, text_cond, text_mask, spkr_cond, prom_mask):
        """x_t: (B, Tr, in_dim) continuous noisy input → ε̂ same shape."""
        x = self.in_proj(x_t.astype(self.dtype))
        x = x + sinusoidal_embedding(
            jnp.arange(x.shape[1])[None], self.d_model
        ).astype(self.dtype)
        x = x * resp_mask[..., None].astype(self.dtype)
        if self.unet_dims:
            skips = []
            for proj in self.down_projs:
                skips.append(x)
                x = nn.gelu(proj(x))
            text_cond = self.cond_proj(text_cond)
            spkr_cond = self.cond_proj(spkr_cond)
        t_emb = self.time_emb(t).astype(self.dtype)
        for block in self.blocks:
            x = block(
                x, resp_mask, text_cond, text_mask, spkr_cond, prom_mask, t_emb
            )
        if self.unet_dims:
            for proj, skip in zip(self.up_projs, reversed(skips)):
                x = nn.gelu(proj(x)) + skip
        eps = self.out_proj(x.astype(jnp.float32))
        return eps * resp_mask[..., None]

    def __call__(self, text, text_mask, proms, prom_mask, x_t, resp_mask, t):
        tc, sc = self.conds(text, text_mask, proms, prom_mask)
        return self.denoise(x_t, resp_mask, t, tc, text_mask, sc, prom_mask)


class GaussianDiffusionModel:
    """Functional wrapper: loss + scan sampler for the continuous family."""

    def __init__(self, config: GaussianConfig = GaussianConfig(), dtype=jnp.bfloat16):
        self.config = config
        self.in_dim = config.d_model if config.domain == "embedding" else 1
        if config.denoiser == "unet2d-ref":
            if config.domain != "value":
                raise ValueError("unet2d-ref denoiser requires domain='value'")
            from .unet2dcond import UNet2DCondDenoiser

            self.denoiser = UNet2DCondDenoiser(
                in_dim=self.in_dim,
                d_model=config.d_model,
                n_heads=config.n_heads,
                n_classes=config.n_tokens + 1,
                n_prom_levels=config.n_prom_levels,
                timesteps=config.timesteps,
                text_len=config.text_len,
                prom_len=config.prom_len,
                channels=tuple(config.unet_channels),
                dtype=dtype,
            )
        elif config.denoiser == "conv-unet":
            if config.domain != "value":
                raise ValueError("conv-unet denoiser requires domain='value'")
            from .unet import ConvUNetDenoiser

            self.denoiser = ConvUNetDenoiser(
                in_dim=self.in_dim,
                d_model=config.d_model,
                n_heads=config.n_heads,
                n_classes=config.n_tokens + 1,
                n_prom_levels=config.n_prom_levels,
                timesteps=config.timesteps,
                channels=tuple(config.unet_channels),
                dtype=dtype,
            )
        else:
            self.denoiser = GaussianDenoiser(
                in_dim=self.in_dim,
                d_model=config.d_model,
                n_heads=config.n_heads,
                n_layers=config.n_layers,
                n_classes=config.n_tokens + 1,
                n_prom_levels=config.n_prom_levels,
                timesteps=config.timesteps,
                unet_dims=tuple(config.unet_dims),
                dtype=dtype,
                remat=config.remat,
                remat_policy=config.remat_policy,
            )
        self.process = GaussianDiffusion.create(config.timesteps, config.schedule)

    def _conds(self, params, text, text_mask, proms, prom_mask):
        """Denoiser-agnostic conditioning state: a 4-tuple matching the
        denoise method's trailing arguments for either architecture."""
        out = self.denoiser.apply(
            params, text, text_mask, proms, prom_mask, method="conds"
        )
        if self.config.denoiser in ("conv-unet", "unet2d-ref"):
            cond, cond_mask = out
            return (cond, cond_mask, None, None)
        tc, sc = out
        return (tc, text_mask, sc, prom_mask)

    def init(self, rng):
        c = self.config
        text = jnp.zeros((1, c.text_len), jnp.int32)
        tm = jnp.ones((1, c.text_len), jnp.float32)
        proms = jnp.zeros((1, c.prom_len, c.n_prom_levels), jnp.int32)
        pm = jnp.ones((1, c.prom_len), jnp.float32)
        x = jnp.zeros((1, c.resp_len, self.in_dim), jnp.float32)
        rm = jnp.ones((1, c.resp_len), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        return self.denoiser.init(rng, text, tm, proms, pm, x, rm, t)

    def _embed_table(self, params):
        table = params["params"]["resp_table"]
        return nn.meta.unbox(table)  # strip partitioning metadata if boxed

    def _to_domain(self, params, resp: jax.Array) -> jax.Array:
        """Integer level-0 tokens → the continuous diffusion domain."""
        if self.config.domain == "embedding":
            table = self._embed_table(params)
            return table[resp].astype(jnp.float32)
        return normalize_tokens(resp, self.config.n_tokens)[..., None]

    def _from_domain(self, params, x: jax.Array) -> jax.Array:
        if self.config.domain == "embedding":
            return nearest_embedding(x, self._embed_table(params))
        return denormalize_tokens(x[..., 0], self.config.n_tokens)

    def loss(self, params, batch: dict, rng: jax.Array, max_t: int | None = None):
        """ε-prediction MSE at a sampled timestep (the reference loops all t
        and sums masked MSE, ``ar-last.py:389-413``; sampled-t is standard)."""
        c = self.config
        T = max_t or c.timesteps
        resp, rm = batch["resp"], batch["resp_mask"]
        B = resp.shape[0]
        x0 = self._to_domain(params, resp)

        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (B,), 1, T)
        noise = jax.random.normal(rng_n, x0.shape, jnp.float32)
        x_t = self.process.q_sample(x0, t, noise)
        x_t = x_t * rm[..., None]

        eps = self.denoiser.apply(
            params, batch["text"], batch["text_mask"], batch["proms"],
            batch["prom_mask"], x_t, rm, t,
        )
        mse = ((eps - noise) ** 2 * rm[..., None]).sum() / jnp.maximum(
            rm.sum() * x0.shape[-1], 1.0
        )
        return mse, {"mse": mse}

    def generate(self, params, text, text_mask, proms, prom_mask, rng,
                 gen_len: int | None = None):
        """Reverse loop as one ``lax.scan``; decode to tokens at the end.

        ``rng`` is a single key or per-row keys (B, 2) — all noise is drawn
        per row (``utils/rng.py``), so a row's tokens depend only on its own
        key and batched serving stays per-request reproducible (the same
        contract as the D3PM ``DiffusionModel.generate``).
        """
        from ..utils.rng import as_row_keys, fold_rows, row_normal

        c = self.config
        B = text.shape[0]
        gl = gen_len if gen_len is not None else c.gen_len
        rm = (jnp.arange(c.resp_len)[None, :] < gl).astype(jnp.float32)
        rm = jnp.broadcast_to(rm, (B, c.resp_len))

        row_keys = as_row_keys(rng, B)
        # init noise tagged with T (disjoint from every step tag in [0, T))
        x = row_normal(
            fold_rows(row_keys, c.timesteps), (c.resp_len, self.in_dim)
        )
        x = x * rm[..., None]

        cond_state = self._conds(params, text, text_mask, proms, prom_mask)
        ts = jnp.arange(c.timesteps - 1, -1, -1)

        def step(x_t, t_scalar):
            t = jnp.full((B,), t_scalar, jnp.int32)
            eps = self.denoiser.apply(
                params, x_t, rm, t, *cond_state, method="denoise",
            )
            z = row_normal(fold_rows(row_keys, t_scalar), x_t.shape[1:])
            x_prev = self.process.p_sample(eps, x_t, t, z)
            return x_prev * rm[..., None], None

        x, _ = jax.lax.scan(step, x, ts)
        tokens = self._from_domain(params, x)
        return (tokens * rm).astype(jnp.int32)
