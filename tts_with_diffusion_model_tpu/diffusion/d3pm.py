"""D3PM discrete-state diffusion core, as pure functions over device arrays.

TPU-native rebuild of the D3PM math grafted into the reference
(``vall_e/vall_e/ar_discrete.py:255-502``): absorbing-state (and uniform)
transition matrices, forward corruption ``q(x_t|x_0)`` via Gumbel-argmax,
posterior ``q(x_{t-1}|x_t,x_0)``, and the ancestral sampler ``p_sample``.

Design decisions vs the reference (intent-preserving, documented):
  - fp32 matrices.  The reference stores Q_t and cumulative products in fp16
    on GPU (``ar_discrete.py:268-277``); β/V ≈ 1e-7 underflows fp16, so the
    uniform-matrix path silently loses its off-diagonal mass.  We keep fp32.
  - ``_at`` (one-hot × Q_t, ``ar_discrete.py:337-345``) is a row *gather*:
    one_hot(x) @ A == A[x].  The rebuild gathers instead of materializing
    (B, T, V) one-hots and (V, V) matmuls — same math, ~1000× less FLOPs.
    ``_at_onehot`` (soft x_0 probabilities) stays a real matmul on the MXU.
  - The whole reverse process runs as one ``jax.lax.scan`` (see
    ``models/diffusion.py``), not a Python loop over 99 device round-trips.
  - All stochastic steps take explicit uniform noise or a PRNG key, so tests
    can verify parity under injected noise (SURVEY §7.3).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import get_schedule


def absorbing_transition_mat(beta_t: float, num_classes: int) -> np.ndarray:
    """Q_t with an absorbing state at ``num_classes // 2``
    (≡ ``ar_discrete.py:315-334``): rows keep 1-β on the diagonal and send β
    to the absorbing column."""
    mat = np.diag(np.full(num_classes, 1.0 - beta_t, dtype=np.float64))
    mat[:, num_classes // 2] += beta_t
    return mat


def uniform_transition_mat(beta_t: float, num_classes: int) -> np.ndarray:
    """Uniform-corruption Q_t (≡ ``ar_discrete.py:308-313``)."""
    mat = np.full((num_classes, num_classes), beta_t / num_classes, dtype=np.float64)
    np.fill_diagonal(mat, 1.0 - beta_t * (num_classes - 1) / num_classes)
    return mat


@dataclasses.dataclass(frozen=True)
class D3PM:
    """Precomputed transition structure + the D3PM operations.

    Matches the reference construction (``ar_discrete.py:255-277``):
    ``timesteps`` one-step matrices Q_t from ``betas[0..T-1]``, cumulated
    into ``q_mats[t] = Q_0 @ ... @ Q_t``, plus transposed one-step mats.
    """

    timesteps: int
    num_classes: int
    betas: jax.Array                 # (T+1,) schedule (index t used for Q_t)
    q_onestep_mats: jax.Array        # (T, V, V)
    q_mats: jax.Array                # (T, V, V) cumulative products
    transpose_q_onestep_mats: jax.Array  # (T, V, V)
    eps: float = 1e-6

    @property
    def absorbing_state(self) -> int:
        return self.num_classes // 2

    @classmethod
    def create(
        cls,
        timesteps: int = 100,
        num_classes: int = 1025,
        schedule: str = "cosine",
        transition: str = "absorbing",
        dtype=jnp.float32,
    ) -> "D3PM":
        # The reference builds betas over timesteps+1 then uses [0..T-1]
        # (``ar_discrete.py:257, 268-269``).
        betas = np.asarray(get_schedule(schedule, timesteps + 1), dtype=np.float64)
        make = (
            absorbing_transition_mat
            if transition == "absorbing"
            else uniform_transition_mat
        )
        q_onestep = np.stack(
            [make(float(betas[t]), num_classes) for t in range(timesteps)]
        )
        q_mats = np.empty_like(q_onestep)
        q_mats[0] = q_onestep[0]
        for t in range(1, timesteps):
            q_mats[t] = q_mats[t - 1] @ q_onestep[t]
        return cls(
            timesteps=timesteps,
            num_classes=num_classes,
            betas=jnp.asarray(betas, dtype=dtype),
            q_onestep_mats=jnp.asarray(q_onestep, dtype=dtype),
            q_mats=jnp.asarray(q_mats, dtype=dtype),
            transpose_q_onestep_mats=jnp.asarray(
                np.swapaxes(q_onestep, 1, 2), dtype=dtype
            ),
        )

    # ---------------- core ops ----------------

    def _at(self, a: jax.Array, t: jax.Array, x: jax.Array) -> jax.Array:
        """Row extraction a[t][x] (≡ one-hot(x) @ a[t], ``ar_discrete.py:337-345``).

        a: (T, V, V); t: (B,); x: (B, W) ints → (B, W, V).
        """
        return a[t[:, None], x]

    def _at_onehot(self, a: jax.Array, t: jax.Array, x: jax.Array) -> jax.Array:
        """Soft version: x (B, W, V) probabilities @ a[t] (≡ ``:377-400``)."""
        return jnp.einsum(
            "bwv,bvu->bwu", x, a[t], preferred_element_type=jnp.float32
        )

    def q_probs(self, x_start: jax.Array, t: jax.Array) -> jax.Array:
        """q(x_t | x_0) rows for integer x_0 (≡ ``:489-502``)."""
        return self._at(self.q_mats, t, x_start)

    def q_sample(
        self,
        x_start: jax.Array,   # (B, W) int
        t: jax.Array,         # (B,)
        uniform_noise: jax.Array | None = None,  # (B, W, V) in [0, 1)
        rng: jax.Array | None = None,
    ) -> jax.Array:
        """Sample x_t ~ q(x_t|x_0) by Gumbel-argmax (≡ ``:467-487``)."""
        logits = jnp.log(self.q_probs(x_start, t) + self.eps)
        if uniform_noise is None:
            if rng is None:
                raise ValueError("q_sample needs uniform_noise or rng")
            uniform_noise = jax.random.uniform(
                rng, logits.shape, dtype=jnp.float32
            )
        noise = jnp.clip(uniform_noise, jnp.finfo(jnp.float32).tiny, 1.0)
        gumbel = -jnp.log(-jnp.log(noise))
        return jnp.argmax(logits + gumbel, axis=-1)

    def q_posterior_logits(
        self,
        x_start: jax.Array,   # logits (B, W, V) if x_start_logits else ints (B, W)
        x_t: jax.Array,       # (B, W) int
        t: jax.Array,         # (B,)
        x_start_logits: bool,
    ) -> jax.Array:
        """log q(x_{t-1} | x_t, x_0) up to a constant (≡ ``:347-375``).

        fact1 = Q_t^T rows at x_t; fact2 = (softmax(x0 logits)) @ q_mats[t-1]
        (or hard rows for integer x_0); at t == 0 return the x_0 logits.
        """
        fact1 = self._at(self.transpose_q_onestep_mats, t, x_t)
        t_1 = jnp.where(t == 0, t, t - 1)
        if x_start_logits:
            fact2 = self._at_onehot(
                self.q_mats, t_1, jax.nn.softmax(x_start, axis=-1)
            )
            tzero_logits = x_start
        else:
            fact2 = self._at(self.q_mats, t_1, x_start)
            tzero_logits = jnp.log(
                jax.nn.one_hot(x_start, self.num_classes) + self.eps
            )
        out = jnp.log(fact1 + self.eps) + jnp.log(fact2 + self.eps)
        t_broadcast = t.reshape(t.shape[0], *([1] * (out.ndim - 1)))
        return jnp.where(t_broadcast == 0, tzero_logits, out)

    def p_sample(
        self,
        model_logits: jax.Array,  # denoiser x_0 logits (B, W, V)
        t: jax.Array,             # (B,)
        x_t: jax.Array,           # (B, W)
        uniform_noise: jax.Array | None = None,
        rng: jax.Array | None = None,
    ) -> jax.Array:
        """Ancestral step x_{t-1} ~ p(x_{t-1}|x_t) (≡ ``:401-420``): posterior
        under the predicted x_0, Gumbel-argmax with no noise at t == 0."""
        pred_x_start_logits = model_logits
        post = self.q_posterior_logits(
            pred_x_start_logits, x_t, t, x_start_logits=True
        )
        t_broadcast = t.reshape(t.shape[0], *([1] * (post.ndim - 1)))
        logits = jnp.where(t_broadcast == 0, pred_x_start_logits, post)

        if uniform_noise is None:
            if rng is None:
                raise ValueError("p_sample needs uniform_noise or rng")
            uniform_noise = jax.random.uniform(rng, logits.shape, dtype=jnp.float32)
        noise = jnp.clip(uniform_noise, jnp.finfo(jnp.float32).tiny, 1.0)
        gumbel = -jnp.log(-jnp.log(noise))
        nonzero = (t != 0).astype(logits.dtype)
        nonzero = nonzero.reshape(t.shape[0], *([1] * (logits.ndim - 1)))
        return jnp.argmax(logits + nonzero * gumbel, axis=-1)
