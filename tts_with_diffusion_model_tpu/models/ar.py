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

from ..utils.rng import as_row_keys, fold_rows, row_gumbel
from .base import Base, build_targets, masked_cross_entropy, sample_categorical


class AR(nn.Module):
    n_tokens: int
    d_model: int = 512
    n_heads: int = 8
    n_layers: int = 12
    p_dropout: float = 0.1
    remat: bool = True
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
