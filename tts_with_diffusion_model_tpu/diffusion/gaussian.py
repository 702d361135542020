"""Continuous Gaussian DDPM core — the reference's earlier diffusion family.

The reference kept seven superseded snapshots of continuous-diffusion
designs before landing on the D3PM (SURVEY §0): Gaussian DDPM over resp
*embedding vectors* with nearest-embedding decode (``ar2.py``,
``ar-dit.py``), over *normalized integer token values* (``ar-4.py``,
``ar-last.py``), with cosine/linear/vpsde schedules and the standard
closed-form terms (``ar2.py:200-215``, ``ar-4.py:319-334``).  This module
is the one clean implementation of that capability family: all closed-form
terms precomputed fp32, ε-prediction loss, ancestral reverse step, both
decode domains.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import get_schedule


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Closed-form DDPM terms (≡ the commented block the reference computes
    in every continuous variant, e.g. ``ar2.py:200-215``)."""

    timesteps: int
    betas: jax.Array
    alphas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_recip_alphas: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    posterior_variance: jax.Array

    @classmethod
    def create(cls, timesteps: int = 100, schedule: str = "cosine", **kw):
        betas = np.asarray(get_schedule(schedule, timesteps, **kw), np.float64)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.concatenate([[1.0], ac[:-1]])
        post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
        f = lambda x: jnp.asarray(x, jnp.float32)
        return cls(
            timesteps=timesteps,
            betas=f(betas),
            alphas=f(alphas),
            alphas_cumprod=f(ac),
            alphas_cumprod_prev=f(ac_prev),
            sqrt_recip_alphas=f(np.sqrt(1.0 / alphas)),
            sqrt_alphas_cumprod=f(np.sqrt(ac)),
            sqrt_one_minus_alphas_cumprod=f(np.sqrt(1.0 - ac)),
            posterior_variance=f(post_var),
        )

    def _gather(self, a: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
        return a[t].reshape(t.shape[0], *([1] * (ndim - 1)))

    def q_sample(self, x0: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """x_t = √ᾱ_t·x₀ + √(1−ᾱ_t)·ε (≡ ``ar2.py:290+`` forward)."""
        s1 = self._gather(self.sqrt_alphas_cumprod, t, x0.ndim)
        s2 = self._gather(self.sqrt_one_minus_alphas_cumprod, t, x0.ndim)
        return s1 * x0 + s2 * noise

    def p_sample(
        self,
        eps_pred: jax.Array,
        x_t: jax.Array,
        t: jax.Array,
        noise: jax.Array,
        clip: float | None = None,
    ) -> jax.Array:
        """Ancestral reverse step from ε-prediction (≡ the
        ``reverse_diffusion`` in ``ar_discrete.py:553-573`` / ``ar-last.py``):
        μ = 1/√α_t (x_t − β_t/√(1−ᾱ_t)·ε̂), plus √posterior_var·z for t>0."""
        sra = self._gather(self.sqrt_recip_alphas, t, x_t.ndim)
        beta = self._gather(self.betas, t, x_t.ndim)
        som = self._gather(self.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
        pv = self._gather(self.posterior_variance, t, x_t.ndim)
        mean = sra * (x_t - beta / som * eps_pred)
        if clip is not None:
            mean = jnp.clip(mean, -clip, clip)
        nonzero = (t > 0).astype(x_t.dtype).reshape(-1, *([1] * (x_t.ndim - 1)))
        return mean + nonzero * jnp.sqrt(pv) * noise


def normalize_tokens(x: jax.Array, num_tokens: int) -> jax.Array:
    """ints [0, V) → [-1, 1] (≡ ``ar-4.py:409`` normalize_input)."""
    return x.astype(jnp.float32) / (num_tokens - 1) * 2.0 - 1.0


def denormalize_tokens(x: jax.Array, num_tokens: int) -> jax.Array:
    """[-1, 1] → ints [0, V) (≡ ``ar-last.py`` denormalize_input)."""
    ids = jnp.round((x + 1.0) / 2.0 * (num_tokens - 1))
    return jnp.clip(ids, 0, num_tokens - 1).astype(jnp.int32)


def nearest_embedding(x: jax.Array, table: jax.Array) -> jax.Array:
    """Nearest-embedding token decode (≡ ``find_closest_embedding``,
    ``ar2.py:424+``).  x: (..., D); table: (V, D) → (...,) int32."""
    dots = jnp.einsum("...d,vd->...v", x, table, preferred_element_type=jnp.float32)
    sq = jnp.sum(table.astype(jnp.float32) ** 2, axis=-1)
    return jnp.argmin(sq - 2.0 * dots, axis=-1).astype(jnp.int32)
