"""The D3PM diffusion TTS model: denoiser + training loss + scan sampler.

Rebuild of ``vall_e/vall_e/ar_discrete.py:588-780`` (the thesis's headline
model).  The model predicts x_0 logits for level-0 codec tokens under an
absorbing-state discrete diffusion; the NAR fills levels 1-7 afterwards.

Key mappings:
  - training forward (``:588-694``): the reference loops over *all* 99
    timesteps per batch, summing masked CE of the x_0 prediction.  Upstream
    D3PM trains with one sampled t per example; we default to sampled-t
    (``train_mode="sampled"``) and keep ``"all_t"`` as a reference-parity
    mode — both available via ``max_train_diffusion_steps``-style config.
  - sampler ``generate_audio`` (``:696-780``): init all-absorbing (512)
    length-350 sequence padded to 448, reverse loop t=99→1.  Here the whole
    loop is one ``jax.lax.scan`` with conditioning computed once — the
    BASELINE.json headline requirement.
  - fixed shapes resp 448 / text 50 / prom 398 (``:592-626``) become config
    fields (the defaults match the reference).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..diffusion.d3pm import D3PM
from ..utils.rng import as_row_keys, fold_rows, row_gumbel, row_uniform
from .dit import DiTDenoiser


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    n_classes: int = 1025
    d_model: int = 512
    n_heads: int = 8
    n_layers: int = 8
    n_prom_levels: int = 8
    timesteps: int = 100
    schedule: str = "cosine"
    transition: str = "absorbing"
    # static shape buckets (≡ ``ar_discrete.py:592-626``)
    resp_len: int = 448
    text_len: int = 50
    prom_len: int = 398
    gen_len: int = 350  # generated sequence length (``:699``)
    train_mode: str = "sampled"  # "sampled" | "all_t"
    # Denoiser architecture knobs (reference-parity values for imported
    # reference checkpoints: 2048 / "relu" / False — see models/dit.py)
    tower_ffn_dim: int | None = None
    tower_act: str = "gelu"
    resp_pe: bool = True
    # per-block gradient checkpointing in the denoiser (training memory
    # lever; see models/dit.py) — wired from cfg.gradient_checkpointing
    remat: bool = False
    # remat policy: None = full recompute, "dots" = save matmul outputs and
    # recompute only between them (models/dit.py resolve_remat_policy) —
    # wired from cfg.gradient_checkpointing_policy
    remat_policy: str | None = None
    # DiT-block self-attention implementation: None/"dense" = XLA,
    # "flash" = fully-fused library Pallas kernel (training HBM lever;
    # models/dit.py, ops/attention.py) — wired from cfg.attn_impl
    attn_impl: str | None = None

    @property
    def serving_resp_bucket(self) -> int:
        """Tight serving bucket: the smallest 128-multiple covering
        ``gen_len`` (384 for the production 350), capped at ``resp_len``.
        Valid tokens are bit-identical to the full-bucket program (tested);
        the shrunken sequence cuts the per-step O(T²) attention cost.  One
        definition for every consumer (CLI, server, benchmarks)."""
        return min(self.resp_len, -(-self.gen_len // 128) * 128)


class DiffusionModel:
    """Functional wrapper pairing a DiTDenoiser with the D3PM process.

    Not an nn.Module: the denoiser holds all parameters; diffusion matrices
    are static device constants.  Methods are jit-friendly pure functions of
    (params, batch, rng).
    """

    def __init__(self, config: DiffusionConfig = DiffusionConfig(), dtype=jnp.bfloat16):
        self.config = config
        self.denoiser = DiTDenoiser(
            n_classes=config.n_classes,
            d_model=config.d_model,
            n_heads=config.n_heads,
            n_layers=config.n_layers,
            n_prom_levels=config.n_prom_levels,
            timesteps=config.timesteps,
            dtype=dtype,
            tower_ffn_dim=config.tower_ffn_dim,
            tower_act=config.tower_act,
            resp_pe=config.resp_pe,
            remat=config.remat,
            remat_policy=config.remat_policy,
            attn_impl=config.attn_impl,
        )
        self.d3pm = D3PM.create(
            timesteps=config.timesteps,
            num_classes=config.n_classes,
            schedule=config.schedule,
            transition=config.transition,
        )

    def init(self, rng):
        c = self.config
        text = jnp.zeros((1, c.text_len), jnp.int32)
        tm = jnp.ones((1, c.text_len), jnp.float32)
        proms = jnp.zeros((1, c.prom_len, c.n_prom_levels), jnp.int32)
        pm = jnp.ones((1, c.prom_len), jnp.float32)
        x = jnp.zeros((1, c.resp_len), jnp.int32)
        rm = jnp.ones((1, c.resp_len), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        return self.denoiser.init(rng, text, tm, proms, pm, x, rm, t)

    # ---------------- training ----------------

    def loss(
        self,
        params,
        batch: dict,
        rng: jax.Array | None,
        max_t: int | None = None,
        q_noise: jax.Array | None = None,
        conds: tuple | None = None,
    ):
        """Masked x_0-prediction CE (≡ ``ar_discrete.py:651-693``).

        batch: text (B,Tt), text_mask, proms (B,Tp,8), prom_mask,
        resp (B,Tr) level-0 ints, resp_mask.  ``max_t`` caps the timestep
        range (the ``max_train_diffusion_steps`` config knob,
        ``utils/config.py:26``).

        ``q_noise`` injects the forward-corruption uniform noise instead of
        drawing from ``rng`` — shape (T-1, B, Tr, V) for ``all_t``, (B, Tr, V)
        for ``sampled`` (with ``rng`` still drawing the timesteps).  ``conds``
        injects precomputed (text_cond, spkr_cond) towers.  Both exist so the
        oracle suite can run the reference's composite training forward
        (``ar_discrete.py:588-694``) and this loss on identical randomness.
        """
        c = self.config
        T = max_t or c.timesteps
        text, tm = batch["text"], batch["text_mask"]
        proms, pm = batch["proms"], batch["prom_mask"]
        resp, rm = batch["resp"], batch["resp_mask"]
        B = resp.shape[0]

        if conds is not None:
            text_cond, spkr_cond = conds
        else:
            text_cond, spkr_cond = self.denoiser.apply(
                params, text, tm, proms, pm, method=DiTDenoiser.conds
            )

        def ce_at_t(t, noise_rng, noise=None):
            x_t = self.d3pm.q_sample(resp, t, uniform_noise=noise, rng=noise_rng)
            x_t = (x_t * rm).astype(jnp.int32)
            logits = self.denoiser.apply(
                params, x_t, rm, t, text_cond, tm, spkr_cond, pm,
                method=DiTDenoiser.denoise,
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, resp[..., None], axis=-1)[..., 0]
            return (nll * rm).sum() / jnp.maximum(rm.sum(), 1.0)

        if c.train_mode == "all_t":
            # Reference-parity: every timestep 1..T-1 per batch
            # (``ar_discrete.py:651``), averaged (the reference's
            # ``/mask.sum()`` normalization is a quirk; mean is the intent).
            # One scan body serves both noise sources: injected ``q_noise``
            # (oracle parity) or per-step keys split from ``rng``.
            noise_mode = q_noise is not None
            xs = q_noise if noise_mode else jax.random.split(rng, T - 1)

            def body(carry, inp):
                t_scalar, aux = inp
                t = jnp.full((B,), t_scalar, jnp.int32)
                if noise_mode:
                    return carry + ce_at_t(t, None, aux), None
                return carry + ce_at_t(t, aux), None

            total, _ = jax.lax.scan(
                body, jnp.float32(0.0), (jnp.arange(1, T), xs)
            )
            loss = total / (T - 1)
        else:
            rng_t, rng_n = jax.random.split(rng)
            t = jax.random.randint(rng_t, (B,), 1, T)
            loss = ce_at_t(t, rng_n, q_noise)

        return loss, {"nll": loss}

    # ---------------- sampling ----------------

    def generate(
        self,
        params,
        text,
        text_mask,
        proms,
        prom_mask,
        rng: jax.Array,
        gen_len: int | None = None,
        stride: int = 1,
        resp_bucket: int | None = None,
    ):
        """Reverse D3PM as one ``lax.scan`` (≡ ``generate_audio``, ``:696-780``).

        ``stride > 1`` skips process steps using the closed-form interval
        posterior (``d3pm.p_sample_strided``): ``stride=3`` runs 33 denoiser
        evaluations instead of 99 for ~3× lower latency (quality/speed knob
        the reference's dense-matrix formulation can't offer cheaply).

        ``rng`` is either one key or per-row keys (B, 2); all sampling noise
        is drawn per row, so a row's tokens depend only on its own key —
        batched serving stays per-request reproducible (``utils/rng.py``).

        ``resp_bucket`` overrides the sequence bucket (default
        ``config.resp_len``): padding past ``gen_len`` is masked out of
        every attention and norm, and per-row noise draws are row-major
        prefix-stable, so a tighter bucket (e.g. 384 for the default
        gen_len 350) produces **bit-identical tokens** at the valid
        positions while cutting the dominant O(T²) self-attention cost —
        the reference pads everything to 448 unconditionally
        (``ar_discrete.py:592-626``).

        Returns (B, resp_bucket) int tokens; positions ≥ gen_len are 0.
        """
        c = self.config
        B = text.shape[0]
        gl = gen_len if gen_len is not None else c.gen_len
        bucket = resp_bucket if resp_bucket is not None else c.resp_len
        if bucket < gl:
            raise ValueError(f"resp_bucket {bucket} < gen_len {gl}")
        # mask: first gen_len slots live, rest padding (≡ ``:699-709``)
        rm = (jnp.arange(bucket)[None, :] < gl).astype(jnp.float32)
        rm = jnp.broadcast_to(rm, (B, bucket))
        x = jnp.full((B, bucket), self.d3pm.absorbing_state, jnp.int32)
        x = (x * rm).astype(jnp.int32)

        text_cond, spkr_cond = self.denoiser.apply(
            params, text, text_mask, proms, prom_mask, method=DiTDenoiser.conds
        )
        # conditioning K/V hoisted out of the reverse loop (timestep-constant)
        kv_list = self.denoiser.apply(
            params, text_cond, spkr_cond, method=DiTDenoiser.cond_kv
        )

        ts_list = list(range(c.timesteps - 1, 0, -stride))  # 99, 99-k, ...
        ss_list = ts_list[1:] + [0]
        ts = jnp.asarray(ts_list, jnp.int32)
        ss = jnp.asarray(ss_list, jnp.int32)
        row_keys = as_row_keys(rng, B)

        def step(x_t, inp):
            t_scalar, s_scalar = inp
            t = jnp.full((B,), t_scalar, jnp.int32)
            s = jnp.full((B,), s_scalar, jnp.int32)
            logits = self.denoiser.apply(
                params, x_t, rm, t, kv_list, text_mask, prom_mask,
                method=DiTDenoiser.denoise_with_kv,
            )
            # Per-row noise keyed by the *process* timestep (not the loop
            # index), so a row's draw stream is also stride-invariant.
            noise = row_uniform(
                fold_rows(row_keys, t_scalar), logits.shape[1:]
            )
            if stride == 1:
                x_prev = self.d3pm.p_sample(
                    logits, t, x_t, uniform_noise=noise
                )
            else:
                x_prev = self.d3pm.p_sample_strided(
                    logits, t, s, x_t, uniform_noise=noise
                )
            x_prev = (x_prev * rm).astype(jnp.int32)
            return x_prev, None

        x, _ = jax.lax.scan(step, x, (ts, ss))
        return x

    def generate_maskgit(
        self,
        params,
        text,
        text_mask,
        proms,
        prom_mask,
        rng: jax.Array,
        steps: int = 12,
        temperature: float = 1.0,
        choice_temperature: float = 4.5,
        gen_len: int | None = None,
        resp_bucket: int | None = None,
    ):
        """Confidence-ordered parallel decoding (MaskGIT-style) in ``steps``
        denoiser evaluations instead of the 99-step ancestral chain.

        The absorbing-state D3PM is exactly a masked-token model: at process
        step t each token is independently absorbed with probability
        ``cum_off[t]``, and the denoiser predicts x_0 from the partially
        masked sequence.  That training distribution also licenses the
        MaskGIT sampler (Chang et al. 2022): start all-masked, and at each of
        K steps sample every still-masked position from the x_0 logits, keep
        the most confident ones per a cosine unmasking schedule, and re-mask
        the rest.  Each step's mask *fraction* is mapped back to the process
        timestep with the nearest expected mask rate, so the denoiser is
        conditioned in-distribution.

        Versus ``generate(stride=k)`` this cuts denoiser evaluations further
        (e.g. 12 vs 99) while choosing *which* tokens to commit by model
        confidence rather than by position-independent chance — the
        quality/latency frontier the reference's dense-matrix formulation
        offers no analogue of (its sampler is the fixed 99-step loop,
        ``ar_discrete.py:750-780``).

        ``rng``: one key or per-row (B, 2) keys; all draws are per-row, so
        batched serving keeps per-request reproducibility.  Returns
        (B, resp_bucket) int tokens; positions ≥ gen_len are 0.
        """
        import numpy as np

        c = self.config
        if self.d3pm.transition != "absorbing":
            raise ValueError("maskgit decoding requires the absorbing family")
        B = text.shape[0]
        gl = gen_len if gen_len is not None else c.gen_len
        bucket = resp_bucket if resp_bucket is not None else c.resp_len
        if bucket < gl:
            raise ValueError(f"resp_bucket {bucket} < gen_len {gl}")
        K = int(steps)
        if not 1 <= K <= gl:
            raise ValueError(f"steps must be in [1, {gl}], got {K}")
        absorb = self.d3pm.absorbing_state

        rm = (jnp.arange(bucket)[None, :] < gl).astype(jnp.float32)
        rm = jnp.broadcast_to(rm, (B, bucket))
        valid = rm.astype(bool)
        x = (jnp.full((B, bucket), absorb, jnp.int32) * rm).astype(jnp.int32)

        text_cond, spkr_cond = self.denoiser.apply(
            params, text, text_mask, proms, prom_mask, method=DiTDenoiser.conds
        )
        kv_list = self.denoiser.apply(
            params, text_cond, spkr_cond, method=DiTDenoiser.cond_kv
        )

        # Static per-step schedule: tokens still masked AFTER step i follows
        # the cosine γ(i/K); the timestep fed to the denoiser at step i is
        # the one whose expected mask rate matches the fraction masked
        # BEFORE the step (cum_off[t] = P[token absorbed by t]).
        mask_rate = np.asarray(self.d3pm.cum_off, np.float64)  # (T,) increasing
        n_mask_after = [
            int(np.floor(gl * np.cos(np.pi / 2 * (i + 1) / K)))
            for i in range(K)
        ]
        n_mask_after[-1] = 0
        keep_counts, ts_sched, anneal = [], [], []
        prev_mask = gl
        for i in range(K):
            frac_before = prev_mask / gl
            t_i = int(np.searchsorted(mask_rate, frac_before))
            ts_sched.append(max(1, min(self.d3pm.timesteps - 1, t_i)))
            keep_counts.append(gl - n_mask_after[i])
            anneal.append(1.0 - (i + 1) / K)
            prev_mask = n_mask_after[i]
        ts = jnp.asarray(ts_sched, jnp.int32)
        keeps = jnp.asarray(keep_counts, jnp.int32)
        anns = jnp.asarray(anneal, jnp.float32)
        idxs = jnp.arange(K, dtype=jnp.int32)
        row_keys = as_row_keys(rng, B)

        neg_inf = jnp.float32(-1e30)
        pos_inf = jnp.float32(1e30)

        def step(carry, inp):
            x_t, known = carry
            t_scalar, keep, ann, i = inp
            t = jnp.full((B,), t_scalar, jnp.int32)
            logits = self.denoiser.apply(
                params, x_t, rm, t, kv_list, text_mask, prom_mask,
                method=DiTDenoiser.denoise_with_kv,
            )
            logits = logits.astype(jnp.float32)
            # Two per-row noise draws, tagged by the step index so a row's
            # stream is independent of batch cohort and of K-invariant code
            # paths: token-sampling Gumbel and selection Gumbel.
            g_tok = row_gumbel(fold_rows(row_keys, 2 * i), logits.shape[1:])
            if temperature > 0:
                sampled = jnp.argmax(logits / temperature + g_tok, axis=-1)
            else:
                sampled = jnp.argmax(logits, axis=-1)
            sampled = sampled.astype(jnp.int32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            conf = jnp.take_along_axis(logp, sampled[..., None], axis=-1)[..., 0]
            g_sel = row_gumbel(fold_rows(row_keys, 2 * i + 1), conf.shape[1:])
            conf = conf + jnp.float32(choice_temperature) * ann * g_sel
            # already-committed tokens always stay; padding never selected
            conf = jnp.where(known, pos_inf, conf)
            conf = jnp.where(valid, conf, neg_inf)
            top_vals = jax.lax.top_k(conf, gl)[0]           # (B, gl) desc
            thresh = jnp.take_along_axis(
                top_vals, jnp.full((B, 1), keep - 1, jnp.int32), axis=1
            )
            selected = (conf >= thresh) & valid
            cand = jnp.where(known, x_t, sampled)
            x_next = jnp.where(selected, cand, absorb)
            x_next = (x_next * rm).astype(jnp.int32)
            return (x_next, selected), None

        (x, _), _ = jax.lax.scan(
            step, (x, valid & False), (ts, keeps, anns, idxs)
        )
        return x
