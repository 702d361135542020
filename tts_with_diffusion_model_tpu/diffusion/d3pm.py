"""D3PM discrete-state diffusion core, as pure functions over device arrays.

TPU-native rebuild of the D3PM math grafted into the reference
(``vall_e/vall_e/ar_discrete.py:255-502``): absorbing-state (and uniform)
transition matrices, forward corruption ``q(x_t|x_0)`` via Gumbel-argmax,
posterior ``q(x_{t-1}|x_t,x_0)``, and the ancestral sampler ``p_sample``.

Design decisions vs the reference (intent-preserving, documented):

  - **Closed-form structured transitions.**  The reference materializes
    100 × 1025×1025 fp16 matrices on the GPU and pays two 1025² matmuls per
    token per step (``ar_discrete.py:268-277, 337-345``).  Both transition
    families are rank-one structured and closed under multiplication:

        absorbing: Q_t = (1-β_t)·I + β_t·1·e_aᵀ
        uniform:   Q_t = (1-β_t)·I + (β_t/V)·J

    so cumulative products reduce to two scalar sequences (c_t, d_t) and
    every matrix product in q_probs/q_posterior becomes O(V) vector math —
    no V×V storage, no MXU time, no fp16 underflow (the reference's
    β/1025 ≈ 1e-7 underflows in fp16; here everything is fp32 scalars).
  - The whole reverse process runs as one ``jax.lax.scan`` (see
    ``models/diffusion.py``), not a Python loop of device round-trips.
  - All stochastic steps take explicit uniform noise or a PRNG key, so
    tests verify parity under injected noise (SURVEY §7.3).
  - Explicit dense matrices remain available for verification
    (``q_mats``/``q_onestep_mats`` properties) and arbitrary transition
    matrices via ``D3PM.from_matrices`` — the ops then use the dense path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import get_schedule


def absorbing_transition_mat(beta_t: float, num_classes: int) -> np.ndarray:
    """Dense Q_t with an absorbing state at ``num_classes // 2``
    (≡ ``ar_discrete.py:315-334``)."""
    mat = np.diag(np.full(num_classes, 1.0 - beta_t, dtype=np.float64))
    mat[:, num_classes // 2] += beta_t
    return mat


def uniform_transition_mat(beta_t: float, num_classes: int) -> np.ndarray:
    """Dense uniform-corruption Q_t (≡ ``ar_discrete.py:308-313``)."""
    mat = np.full((num_classes, num_classes), beta_t / num_classes, dtype=np.float64)
    np.fill_diagonal(mat, 1.0 - beta_t * (num_classes - 1) / num_classes)
    return mat


@dataclasses.dataclass(frozen=True)
class D3PM:
    """Precomputed transition structure + the D3PM operations.

    Structured modes ("absorbing"/"uniform") carry scalar sequences:
    ``cum_diag[t]`` (c_t) and ``cum_off[t]`` (d_t) with
    ``Q̄_t = c_t·I + d_t·1·e_aᵀ`` (absorbing) or ``c_t·I + (d_t/V)·J``
    (uniform).  Dense mode carries explicit matrices.
    """

    timesteps: int
    num_classes: int
    betas: jax.Array          # (T+1,) schedule (index t used for Q_t)
    transition: str           # "absorbing" | "uniform" | "dense"
    cum_diag: jax.Array | None = None   # (T,) c_t
    cum_off: jax.Array | None = None    # (T,) d_t
    _q_onestep: Optional[jax.Array] = None       # dense (T, V, V)
    _q_cum: Optional[jax.Array] = None           # dense (T, V, V)
    eps: float = 1e-6

    @property
    def absorbing_state(self) -> int:
        return self.num_classes // 2

    # ---------------- constructors ----------------

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
        b = betas[:timesteps]
        c = np.cumprod(1.0 - b)  # c_t = Π_{s≤t} (1-β_s) for both families
        # d_t via: d_t = c_{t-1}·β_t + d_{t-1}   (absorbing; e_aᵀ1 = 1)
        #          d_t = β_t·c_{t-1} + d_{t-1}·(1-β_t) + d_{t-1}·β_t = same
        # uniform (J/V): (a1·I+b1·J/V)(a2·I+b2·J/V)
        #              = a1a2·I + (a1b2 + b1a2 + b1b2)·J/V  → same recurrence.
        d = np.empty_like(c)
        d[0] = b[0]
        for t in range(1, timesteps):
            d[t] = c[t - 1] * b[t] + d[t - 1]
        # Row-sum identity: c_t + d_t = 1 for both families.
        assert np.allclose(c + d, 1.0), "cumulative transition rows must sum to 1"
        return cls(
            timesteps=timesteps,
            num_classes=num_classes,
            betas=jnp.asarray(betas, dtype=dtype),
            transition=transition,
            cum_diag=jnp.asarray(c, dtype=dtype),
            cum_off=jnp.asarray(d, dtype=dtype),
        )

    @classmethod
    def from_matrices(
        cls, betas: np.ndarray, q_onestep: np.ndarray, dtype=jnp.float32
    ) -> "D3PM":
        """Arbitrary dense transition matrices (generic/extensibility path)."""
        T, V, _ = q_onestep.shape
        q_cum = np.empty_like(q_onestep, dtype=np.float64)
        q_cum[0] = q_onestep[0]
        for t in range(1, T):
            q_cum[t] = q_cum[t - 1] @ q_onestep[t]
        return cls(
            timesteps=T,
            num_classes=V,
            betas=jnp.asarray(betas, dtype=dtype),
            transition="dense",
            _q_onestep=jnp.asarray(q_onestep, dtype=dtype),
            _q_cum=jnp.asarray(q_cum, dtype=dtype),
        )

    # ---------------- dense views (verification / generic path) ----------------

    def _structured_mats(self, cum: bool) -> np.ndarray:
        b = np.asarray(self.betas[: self.timesteps], np.float64)
        if cum:
            diag = np.asarray(self.cum_diag, np.float64)
            off = np.asarray(self.cum_off, np.float64)
        else:
            diag, off = 1.0 - b, b
        V = self.num_classes
        out = np.zeros((self.timesteps, V, V))
        idx = np.arange(V)
        out[:, idx, idx] = diag[:, None]
        if self.transition == "absorbing":
            out[:, :, V // 2] += off[:, None]
        else:  # uniform: off mass spread over J/V
            out += (off / V)[:, None, None]
        return out

    @property
    def q_onestep_mats(self) -> jax.Array:
        if self._q_onestep is not None:
            return self._q_onestep
        return jnp.asarray(self._structured_mats(cum=False), jnp.float32)

    @property
    def q_mats(self) -> jax.Array:
        if self._q_cum is not None:
            return self._q_cum
        return jnp.asarray(self._structured_mats(cum=True), jnp.float32)

    @property
    def transpose_q_onestep_mats(self) -> jax.Array:
        return jnp.swapaxes(self.q_onestep_mats, 1, 2)

    # ---------------- structured row helpers ----------------

    def _onehot(self, x: jax.Array) -> jax.Array:
        return jax.nn.one_hot(x, self.num_classes, dtype=jnp.float32)

    def _cum_row(self, t: jax.Array, x: jax.Array) -> jax.Array:
        """Row x of Q̄_t: c_t·e_x + off-term (≡ one-hot(x) @ q_mats[t])."""
        c = self.cum_diag[t][:, None, None]
        d = self.cum_off[t][:, None, None]
        row = c * self._onehot(x)
        if self.transition == "absorbing":
            return row.at[..., self.absorbing_state].add(d[..., 0])
        return row + d / self.num_classes

    def _cum_mix(self, t: jax.Array, p: jax.Array) -> jax.Array:
        """p @ Q̄_t for probability rows p (≡ ``_at_onehot``,
        ``ar_discrete.py:377-400``): c_t·p + d_t·(Σp)·e_a (absorbing)."""
        c = self.cum_diag[t][:, None, None]
        d = self.cum_off[t][:, None, None]
        mass = p.sum(axis=-1, keepdims=True)
        out = c * p
        if self.transition == "absorbing":
            return out.at[..., self.absorbing_state].add((d * mass)[..., 0])
        return out + d * mass / self.num_classes

    def _onestep_T_row(self, t: jax.Array, x: jax.Array) -> jax.Array:
        """Row x of Q_tᵀ (≡ ``_at(transpose_q_onestep_mats, t, x)``).

        absorbing: Q_tᵀ = (1-β_t)·I + β_t·e_a·1ᵀ →
                   row = (1-β_t)·e_x + β_t·[x = a]·1
        uniform:   row = (1-β_t)·e_x + β_t/V·1
        """
        beta = self.betas[t][:, None, None]
        row = (1.0 - beta) * self._onehot(x)
        if self.transition == "absorbing":
            is_absorb = (x == self.absorbing_state).astype(jnp.float32)[..., None]
            return row + beta * is_absorb
        return row + beta / self.num_classes

    # ---------------- generic dense helpers ----------------

    def _at(self, a: jax.Array, t: jax.Array, x: jax.Array) -> jax.Array:
        """Row extraction a[t][x] (≡ one-hot(x) @ a[t], ``ar_discrete.py:337-345``)."""
        return a[t[:, None], x]

    def _at_onehot(self, a: jax.Array, t: jax.Array, x: jax.Array) -> jax.Array:
        return jnp.einsum("bwv,bvu->bwu", x, a[t], preferred_element_type=jnp.float32)

    # ---------------- core ops ----------------

    def q_probs(self, x_start: jax.Array, t: jax.Array) -> jax.Array:
        """q(x_t | x_0) rows for integer x_0 (≡ ``ar_discrete.py:489-502``)."""
        if self.transition == "dense":
            return self._at(self.q_mats, t, x_start)
        return self._cum_row(t, x_start)

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
            uniform_noise = jax.random.uniform(rng, logits.shape, dtype=jnp.float32)
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

        fact1 = Q_tᵀ rows at x_t; fact2 = softmax(x0 logits) @ Q̄_{t-1}
        (or hard rows for integer x_0); at t == 0 return the x_0 logits.
        """
        t_1 = jnp.where(t == 0, t, t - 1)
        if self.transition == "dense":
            fact1 = self._at(self.transpose_q_onestep_mats, t, x_t)
            if x_start_logits:
                fact2 = self._at_onehot(
                    self.q_mats, t_1, jax.nn.softmax(x_start, axis=-1)
                )
            else:
                fact2 = self._at(self.q_mats, t_1, x_start)
        else:
            fact1 = self._onestep_T_row(t, x_t)
            if x_start_logits:
                fact2 = self._cum_mix(t_1, jax.nn.softmax(x_start, axis=-1))
            else:
                fact2 = self._cum_row(t_1, x_start)
        if x_start_logits:
            tzero_logits = x_start
        else:
            tzero_logits = jnp.log(
                jax.nn.one_hot(x_start, self.num_classes) + self.eps
            )
        out = jnp.log(fact1 + self.eps) + jnp.log(fact2 + self.eps)
        t_broadcast = t.reshape(t.shape[0], *([1] * (out.ndim - 1)))
        return jnp.where(t_broadcast == 0, tzero_logits, out)

    # ---------------- strided (skip-step) sampling ----------------

    def _interval_diag(self, s: jax.Array, t: jax.Array) -> jax.Array:
        """Diagonal coefficient of Q_{(s,t]} = Π_{u∈(s,t]} Q_u.

        The structured families stay rank-one under products, so the interval
        operator is ``a·I + (1-a)·M`` with ``a = c_t / c_s`` (``c_{-1}=1``).
        At s = t-1 this reduces to the one-step ``1-β_t``.
        """
        cs = jnp.where(s < 0, 1.0, self.cum_diag[jnp.maximum(s, 0)])
        return self.cum_diag[t] / cs

    def q_posterior_logits_strided(
        self,
        x_start_logits: jax.Array,  # (B, W, V)
        x_t: jax.Array,             # (B, W)
        t: jax.Array,               # (B,)
        s: jax.Array,               # (B,) target step, s < t
    ) -> jax.Array:
        """log q(x_s | x_t, x_0-logits) for an arbitrary stride t→s.

        Generalizes ``q_posterior_logits`` (s = t-1) using the closed-form
        interval transition — the basis of skip-step sampling, which the
        reference's dense-matrix formulation would need O(V³) products for.
        Structured transitions only.
        """
        assert self.transition != "dense", "strided sampling needs structured Q"
        a = self._interval_diag(s, t)[:, None, None]
        row = a * self._onehot(x_t)
        if self.transition == "absorbing":
            is_absorb = (x_t == self.absorbing_state).astype(jnp.float32)[..., None]
            fact1 = row + (1.0 - a) * is_absorb
        else:
            fact1 = row + (1.0 - a) / self.num_classes
        fact2 = self._cum_mix(s, jax.nn.softmax(x_start_logits, axis=-1))
        out = jnp.log(fact1 + self.eps) + jnp.log(fact2 + self.eps)
        t_broadcast = t.reshape(t.shape[0], *([1] * (out.ndim - 1)))
        return jnp.where(t_broadcast == 0, x_start_logits, out)

    def p_sample_strided(
        self,
        model_logits: jax.Array,
        t: jax.Array,
        s: jax.Array,
        x_t: jax.Array,
        uniform_noise: jax.Array | None = None,
        rng: jax.Array | None = None,
    ) -> jax.Array:
        """Ancestral step x_s ~ p(x_s|x_t) skipping ``t-s`` process steps."""
        logits = self.q_posterior_logits_strided(model_logits, x_t, t, s)
        if uniform_noise is None:
            if rng is None:
                raise ValueError("p_sample_strided needs uniform_noise or rng")
            uniform_noise = jax.random.uniform(rng, logits.shape, dtype=jnp.float32)
        noise = jnp.clip(uniform_noise, jnp.finfo(jnp.float32).tiny, 1.0)
        gumbel = -jnp.log(-jnp.log(noise))
        nonzero = (t != 0).astype(logits.dtype)
        nonzero = nonzero.reshape(t.shape[0], *([1] * (logits.ndim - 1)))
        return jnp.argmax(logits + nonzero * gumbel, axis=-1)

    def p_logits(
        self, model_logits: jax.Array, t: jax.Array, x_t: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """log p(x_{t-1}|x_t) from x_0-prediction logits (≡ ``p_logits``,
        ``ar_discrete.py:518-538``): the posterior under the predicted x_0,
        degenerating to the x_0 logits at t == 0.  Returns
        (transition logits, pred_x_start_logits)."""
        pred_x_start_logits = model_logits
        post = self.q_posterior_logits(
            pred_x_start_logits, x_t, t, x_start_logits=True
        )
        t_broadcast = t.reshape(t.shape[0], *([1] * (post.ndim - 1)))
        logits = jnp.where(t_broadcast == 0, pred_x_start_logits, post)
        return logits, pred_x_start_logits

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
        logits, _ = self.p_logits(model_logits, t, x_t)

        if uniform_noise is None:
            if rng is None:
                raise ValueError("p_sample needs uniform_noise or rng")
            uniform_noise = jax.random.uniform(rng, logits.shape, dtype=jnp.float32)
        noise = jnp.clip(uniform_noise, jnp.finfo(jnp.float32).tiny, 1.0)
        gumbel = -jnp.log(-jnp.log(noise))
        nonzero = (t != 0).astype(logits.dtype)
        nonzero = nonzero.reshape(t.shape[0], *([1] * (logits.ndim - 1)))
        return jnp.argmax(logits + nonzero * gumbel, axis=-1)
