"""AR model: causal level-0 codec-token generator.

TPU-native rebuild of ``vall_e/vall_e/ar.py:86-169``: causal transformer with
one response level, a stop token, plain LN, and loss over the whole packed
sequence.  Training is one teacher-forced forward; generation is an
incremental KV-cache decode loop compiled as a single ``lax.scan`` (the
reference re-runs the full prefix per token with no cache, ``ar.py:155-166``
— same sampling distribution, orders of magnitude less compute).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.rng import as_row_keys, fold_rows, row_gumbel, row_uniform
from .base import Base, build_targets, masked_cross_entropy, sample_categorical


class AR(nn.Module):
    n_tokens: int
    d_model: int = 512
    n_heads: int = 8
    n_layers: int = 12
    p_dropout: float = 0.1
    remat: bool = True
    remat_policy: str | None = None
    #: batch-path attention impl ("flash" = fused Pallas train kernel on
    #: TPU; models/base.py Attention.attn_impl)
    attn_impl: str | None = None
    dtype: Any = jnp.bfloat16

    # Property block mirroring the reference's Base contract (``ar.py:86-105``)
    @property
    def n_resp_levels(self):
        return 1

    @property
    def causal(self):
        return True

    @property
    def use_stop_token(self):
        return True

    @property
    def norm_type(self):
        return "ln"

    @property
    def resp_loss_only(self):
        return False

    @property
    def stop_token(self):
        return self.n_tokens

    def setup(self):
        self.base = Base(
            n_tokens=self.n_tokens,
            d_model=self.d_model,
            n_heads=self.n_heads,
            n_layers=self.n_layers,
            p_dropout=self.p_dropout,
            causal=True,
            n_resp_levels=1,
            use_stop_token=True,
            norm_type="ln",
            remat=self.remat,
            remat_policy=self.remat_policy,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
        )

    def __call__(
        self,
        text,
        text_mask,
        proms,
        prom_mask,
        resp,          # (B, Tr) level-0 tokens
        resp_mask,     # (B, Tr)
        deterministic: bool = True,
    ):
        """Teacher-forced training forward.  Returns (logits, loss_dict)."""
        logits = self.base(
            text,
            text_mask,
            proms,
            prom_mask,
            resp[..., None],
            resp_mask,
            deterministic=deterministic,
        )
        targets = build_targets(
            text,
            text_mask,
            prom_mask,
            resp,
            resp_mask,
            resp_loss_only=False,
            shift=True,
            stop_token=self.stop_token,
        )
        loss = masked_cross_entropy(logits, targets)
        return logits, {"nll": loss}

    def prefill(self, text, text_mask, proms, prom_mask, total_len: int):
        return self.base.prefill(text, text_mask, proms, prom_mask, total_len)

    def decode_step(self, token, cache):
        return self.base.decode_step(token, cache)

    def decode_chunk(self, tokens, pos0, cache):
        return self.base.decode_chunk(tokens, pos0, cache)


@functools.partial(
    jax.jit, static_argnames=("model", "max_steps", "sampling_temperature")
)
def ar_generate(
    model: AR,
    params,
    text,
    text_mask,
    proms,
    prom_mask,
    rng: jax.Array,
    max_steps: int = 1000,
    sampling_temperature: float = 1.0,
):
    """AR generation as one compiled program: prefill + ``lax.scan`` decode.
    Module-level jit (model is a hashable static arg) so compilations cache
    across calls with the same shapes.

    ``rng``: one key or per-row keys (B, 2); sampling noise is drawn per
    row, so a row's tokens depend only on its own key regardless of batch
    cohort (``utils/rng.py``).

    Returns (tokens (B, max_steps), lengths (B,)): tokens after each
    sample's stop token are junk; ``lengths`` gives the pruned length
    (≡ ``AR._prune``, ``ar.py:107-111``).
    """
    B, Tt = text.shape
    Tp = proms.shape[1]
    prefix_len = Tt + 1 + Tp + 1
    total_len = prefix_len + max_steps
    stop = model.stop_token

    last_logits, cache = model.apply(
        params, text, text_mask, proms, prom_mask, total_len,
        method=AR.prefill,
    )

    row_keys = as_row_keys(rng, B)

    def sample(step_i, logits):
        if sampling_temperature <= 0:
            return sample_categorical(None, logits, 0.0)
        noise = row_gumbel(fold_rows(row_keys, step_i), logits.shape[1:])
        return sample_categorical(
            None, logits, sampling_temperature, gumbel_noise=noise
        )

    tok0 = sample(0, last_logits)

    def step(carry, step_i):
        tok, cache, stopped = carry
        logits, cache = model.apply(params, tok, cache, method=AR.decode_step)
        nxt = sample(step_i, logits)
        nxt = jnp.where(stopped, stop, nxt)
        stopped = stopped | (nxt == stop)
        return (nxt, cache, stopped), tok

    stopped0 = tok0 == stop
    (_, _, _), toks = jax.lax.scan(
        step, (tok0, cache, stopped0), jnp.arange(1, max_steps + 1),
        length=max_steps,
    )
    # toks[i] is the token fed at step i, i.e. the sampled sequence shifted:
    # sequence = [tok0, toks[1], ...]; scan emits the carry token so toks
    # already equals [tok0, nxt_1, ..., nxt_{max_steps-1}].
    tokens = jnp.moveaxis(toks, 0, 1)  # (B, max_steps)
    is_stop = tokens == stop
    any_stop = is_stop.any(axis=1)
    first_stop = jnp.argmax(is_stop, axis=1)
    lengths = jnp.where(any_stop, first_stop, max_steps)
    return tokens, lengths


def _mask_slots(mask, start, keep, width: int):
    """Re-mask one round's cache writes: slot ``start + j`` stays valid iff
    ``j <= keep[b]`` (the speculative rollback — rejected drafts become
    invisible to every later query; no data movement)."""
    vals = (jnp.arange(width)[None, :] <= keep[:, None]).astype(mask.dtype)
    return jax.lax.dynamic_update_slice(mask, vals, (0, start))


@functools.partial(
    jax.jit,
    static_argnames=(
        "target_model", "draft_model", "max_steps", "k",
        "sampling_temperature", "with_stats",
    ),
)
def ar_generate_speculative(
    target_model: AR,
    target_params,
    draft_model: AR,
    draft_params,
    text,
    text_mask,
    proms,
    prom_mask,
    rng: jax.Array,
    max_steps: int = 1000,
    k: int = 4,
    sampling_temperature: float = 0.0,
    with_stats: bool = False,
):
    """Speculative AR decoding: a cheap draft proposes ``k`` tokens per
    round, the target verifies them all in ONE teacher-forced cached
    forward (``Base.decode_chunk``), and the standard acceptance rule
    commits a prefix plus one corrected/bonus token.

    Correctness contract:
      - ``sampling_temperature <= 0`` (greedy verification): the output is
        **token-identical to the target's own greedy decode** for ANY
        draft — rejected proposals are replaced by the target argmax, so
        the draft only affects speed (tested in ``tests/test_ar_spec.py``).
      - ``sampling_temperature > 0``: the classic accept/residual scheme
        (accept x ~ q with prob min(1, p(x)/q(x)); on rejection sample
        from norm(relu(p - q))), which makes every committed token an
        exact sample from the target distribution.  Draws are per-row
        (``utils/rng.py``), so outputs are batch-cohort independent — but
        they are a *different* exact sample than ``ar_generate``'s (the
        noise is consumed in a different order).

    Cache discipline: per-round writes land at a shared slot range and
    rejected entries are *masked out* rather than compacted, so per-row
    acceptance counts can diverge without per-row cache indices.  Slot
    budget is therefore ``prefix + max_steps·(k+1)`` (worst case one
    committed token per round); the loop is a ``while_loop`` that exits
    as soon as every row has stopped or reached ``max_steps``.

    Returns (tokens (B, max_steps), lengths (B,)) like ``ar_generate``.
    With ``with_stats=True`` a third element is appended: a dict with
    ``rounds`` (scalar draft/verify rounds executed) and ``committed``
    (per-row committed token counts), from which the mean accepted-per-
    round / acceptance rate falls out (``benchmarks/spec_decode_bench.py``).
    """
    B, Tt = text.shape
    Tp = proms.shape[1]
    stop = target_model.stop_token
    W = k + 1
    tau = sampling_temperature
    max_rounds = max_steps
    prefix_len = Tt + 1 + Tp + 1
    t_total = prefix_len + max_rounds * W
    d_total = prefix_len + max_rounds * W

    t_logits0, t_cache = target_model.apply(
        target_params, text, text_mask, proms, prom_mask, t_total,
        method=AR.prefill,
    )
    _, d_cache = draft_model.apply(
        draft_params, text, text_mask, proms, prom_mask, d_total,
        method=AR.prefill,
    )

    row_keys = as_row_keys(rng, B)
    TAGS = k + 4  # per-round tag stride: k draft draws + accept + residual

    def sample_from(logits, tag):
        """Categorical sample at ``tau`` (argmax when tau<=0), per-row keys."""
        if tau <= 0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        noise = row_gumbel(fold_rows(row_keys, tag), logits.shape[1:])
        return jnp.argmax(logits / tau + noise, axis=-1).astype(jnp.int32)

    y0 = sample_from(t_logits0, 0)
    buf = jnp.zeros((B, max_steps), jnp.int32)
    buf = buf.at[:, 0].set(y0)

    carry = dict(
        buf=buf,
        cnt=jnp.ones((B,), jnp.int32),       # committed tokens so far
        stopped=(y0 == stop),
        y=y0,                                # committed, not yet fed
        pos_y=t_cache["pos"],                # packed position where y sits
        t_cache=t_cache,
        d_cache=d_cache,
        r=jnp.int32(0),
    )

    def cond(c):
        active = ~c["stopped"] & (c["cnt"] < max_steps)
        return active.any() & (c["r"] < max_rounds)

    def body(c):
        r = c["r"]
        base_tag = 1 + r * TAGS

        # ---- draft: feed [y, x_1..x_k], propose x_1..x_k ---------------
        d_cache = {**c["d_cache"], "pos": c["pos_y"]}
        d_index0 = d_cache["index"]
        tok = c["y"]
        xs, q_fulls = [], []
        for j in range(W):
            logits, d_cache = draft_model.apply(
                draft_params, tok, d_cache, method=AR.decode_step
            )
            if j < k:
                nxt = sample_from(logits, base_tag + j)
                xs.append(nxt)
                if tau > 0:
                    q_fulls.append(jax.nn.softmax(logits / tau, axis=-1))
                tok = nxt
        x = jnp.stack(xs, axis=1)  # (B, k)

        # ---- target verifies the whole chunk in one forward ------------
        chunk = jnp.concatenate([c["y"][:, None], x], axis=1)  # (B, W)
        t_index0 = c["t_cache"]["index"]
        t_logits, t_cache = target_model.apply(
            target_params, chunk, c["pos_y"], c["t_cache"],
            method=AR.decode_chunk,
        )  # t_logits[:, j] = next-token dist after chunk[:, :j+1]

        if tau <= 0:
            tgt = jnp.argmax(t_logits, axis=-1).astype(jnp.int32)  # (B, W)
            accept = x == tgt[:, :k]
        else:
            p = jax.nn.softmax(t_logits / tau, axis=-1)            # (B, W, V)
            q_full = jnp.stack(q_fulls, axis=1)                    # (B, k, V)
            p_at = jnp.take_along_axis(
                p[:, :k], x[..., None], axis=-1
            )[..., 0]
            q_at = jnp.take_along_axis(
                q_full, x[..., None], axis=-1
            )[..., 0]
            u = row_uniform(fold_rows(row_keys, base_tag + k), (k,))
            accept = u < jnp.clip(p_at / jnp.maximum(q_at, 1e-20), 0.0, 1.0)

        n = jnp.argmin(accept.astype(jnp.int32), axis=1)
        n = jnp.where(accept.all(axis=1), k, n).astype(jnp.int32)  # (B,)

        # replacement (n < k: residual dist) / bonus (n == k: target dist)
        sel_logits = jnp.take_along_axis(
            t_logits, n[:, None, None], axis=1
        )[:, 0]  # (B, V)
        if tau <= 0:
            y_new = jnp.argmax(sel_logits, axis=-1).astype(jnp.int32)
        else:
            p_sel = jax.nn.softmax(sel_logits / tau, axis=-1)
            q_ext = jnp.concatenate(
                [q_full, jnp.zeros_like(q_full[:, :1])], axis=1
            )  # q at position k (bonus) = 0 → residual degenerates to p
            q_sel = jnp.take_along_axis(q_ext, n[:, None, None], axis=1)[:, 0]
            res = jnp.maximum(p_sel - q_sel, 0.0)
            norm = res.sum(axis=-1, keepdims=True)
            res = jnp.where(norm > 1e-12, res / jnp.maximum(norm, 1e-12), p_sel)
            g = row_gumbel(fold_rows(row_keys, base_tag + k + 1), (res.shape[-1],))
            y_new = jnp.argmax(
                jnp.log(res + 1e-30) + g, axis=-1
            ).astype(jnp.int32)

        # ---- rollback: rejected entries become invisible ----------------
        t_cache = {
            **t_cache, "mask": _mask_slots(t_cache["mask"], t_index0, n, W)
        }
        d_cache = {
            **d_cache, "mask": _mask_slots(d_cache["mask"], d_index0, n, W)
        }

        # ---- commit x_1..x_n then y_new into the output buffer ----------
        cols = jnp.arange(W)[None, :]
        xpad = jnp.concatenate([x, jnp.zeros((B, 1), jnp.int32)], axis=1)
        vals = jnp.where(cols == n[:, None], y_new[:, None], xpad)
        write_pos = jnp.where(cols <= n[:, None], c["cnt"][:, None] + cols,
                              max_steps)
        write_pos = jnp.where(c["stopped"][:, None], max_steps, write_pos)
        buf = c["buf"].at[jnp.arange(B)[:, None], write_pos].set(
            vals, mode="drop"
        )
        committed_stop = (
            (cols <= n[:, None]) & (vals == stop)
            & ~c["stopped"][:, None]
        ).any(axis=1)
        cnt = jnp.where(
            c["stopped"], c["cnt"],
            jnp.minimum(c["cnt"] + n + 1, max_steps),
        )
        return dict(
            buf=buf,
            cnt=cnt,
            stopped=c["stopped"] | committed_stop,
            y=y_new,
            pos_y=c["pos_y"] + n + 1,
            t_cache=t_cache,
            d_cache=d_cache,
            r=r + 1,
        )

    out = jax.lax.while_loop(cond, body, carry)
    tokens = out["buf"]
    is_stop = tokens == stop
    any_stop = is_stop.any(axis=1)
    first_stop = jnp.argmax(is_stop, axis=1)
    lengths = jnp.where(any_stop, first_stop, out["cnt"])
    if with_stats:
        return tokens, lengths, {"rounds": out["r"], "committed": out["cnt"]}
    return tokens, lengths
