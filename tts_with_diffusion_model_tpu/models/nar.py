"""NAR model: parallel residual-level (2..8) codec-token filler.

TPU-native rebuild of ``vall_e/vall_e/nar.py:7-101``: non-causal transformer
over 7 response levels with AdaLN level conditioning and loss on response
positions only.  Training samples one random level l per batch item, feeds
levels ≤ l and predicts level l+1; inference iterates levels 1→7, each one a
single parallel forward (here each level forward is one jitted call; the
7-step loop is static Python, so XLA compiles exactly one program reused for
every level).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.rng import as_row_keys, fold_rows, row_gumbel
from .base import Base, build_targets, masked_cross_entropy, sample_categorical


class NAR(nn.Module):
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

    # Property block mirroring the reference contract (``nar.py:7-26``)
    @property
    def n_resp_levels(self):
        return 7

    @property
    def causal(self):
        return False

    @property
    def use_stop_token(self):
        return False

    @property
    def norm_type(self):
        return "adaln"

    @property
    def resp_loss_only(self):
        return True

    def setup(self):
        self.base = Base(
            n_tokens=self.n_tokens,
            d_model=self.d_model,
            n_heads=self.n_heads,
            n_layers=self.n_layers,
            p_dropout=self.p_dropout,
            causal=False,
            n_resp_levels=self.n_resp_levels,
            use_stop_token=False,
            norm_type="adaln",
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
        resps,        # (B, Tr, 8) all-level tokens (training)
        resp_mask,    # (B, Tr)
        quant_levels, # (B,) random level l in [0, 7): feed ≤l, predict l+1
        deterministic: bool = True,
    ):
        """Training forward (≡ ``nar.py:53-74``).  Returns (logits, loss_dict).

        The reference slices ragged per-sample level prefixes
        (``o[..., :l+1]``); here the same is expressed with a per-sample
        level mask over the full (B, Tr, 8) tensor — static shapes, no
        per-sample gather.
        """
        B = text.shape[0]
        lvl = jnp.arange(self.n_resp_levels)  # levels 0..6 of the resps input
        level_mask = (lvl[None, :] <= quant_levels[:, None]).astype(jnp.float32)
        prev = resps[..., : self.n_resp_levels]  # levels 0..6 as input slots
        targ = jnp.take_along_axis(
            resps, (quant_levels + 1)[:, None, None], axis=-1
        )[..., 0]  # level l+1 per sample

        logits = self.base(
            text,
            text_mask,
            proms,
            prom_mask,
            prev,
            resp_mask,
            resp_level_mask=level_mask,
            quant_levels=quant_levels,
            deterministic=deterministic,
        )
        targets = build_targets(
            text,
            text_mask,
            prom_mask,
            targ,
            resp_mask,
            resp_loss_only=True,
            shift=False,
            stop_token=None,
        )
        loss = masked_cross_entropy(logits, targets)
        return logits, {"nll": loss}

    def forward_level(
        self,
        text,
        text_mask,
        proms,
        prom_mask,
        resps,        # (B, Tr, 7) token buffer, levels ≥ n_known are junk
        resp_mask,
        n_known: jax.Array,  # scalar int: number of known levels (≥1)
    ):
        """One inference step: predict level ``n_known`` from levels < n_known.

        Returns resp-position logits (B, Tr, V).
        """
        lvl = jnp.arange(self.n_resp_levels)
        level_mask = (lvl[None, :] < n_known).astype(jnp.float32)
        level_mask = jnp.broadcast_to(level_mask, (text.shape[0], self.n_resp_levels))
        quant_levels = jnp.full((text.shape[0],), n_known - 1, dtype=jnp.int32)
        logits = self.base(
            text,
            text_mask,
            proms,
            prom_mask,
            resps,
            resp_mask,
            resp_level_mask=level_mask,
            quant_levels=quant_levels,
            deterministic=True,
        )
        Tr = resps.shape[1]
        return logits[:, -Tr:, :]


def nar_generate(
    model: NAR,
    params,
    text,
    text_mask,
    proms,
    prom_mask,
    resp_level0,   # (B, Tr) level-0 tokens from the AR/diffusion stage
    resp_mask,
    rng: jax.Array,
    sampling_temperature: float = 0.2,
):
    """Fill levels 1..7 given level 0 (≡ ``nar.py:76-99``).

    ``rng``: one key or per-row keys (B, 2); per-level sampling noise is
    drawn per row (keyed by the level index), so a row's codes depend only
    on its own key regardless of batch cohort (``utils/rng.py``).

    Returns (B, Tr, 8) full-level codes.  The level loop is a static
    7-iteration Python loop over one jitted program (shapes identical per
    level, so XLA compiles once).
    """
    B, Tr = resp_level0.shape
    buf = jnp.zeros((B, Tr, model.n_resp_levels), dtype=jnp.int32)
    buf = buf.at[..., 0].set(resp_level0)
    row_keys = as_row_keys(rng, B)

    out_levels = [resp_level0]
    for n_known in range(1, model.n_resp_levels + 1):
        logits = _forward_level_jit(
            model, params, text, text_mask, proms, prom_mask, buf, resp_mask,
            jnp.int32(n_known),
        )
        if sampling_temperature <= 0:
            sampled = sample_categorical(None, logits, 0.0)
        else:
            noise = row_gumbel(
                fold_rows(row_keys, n_known), logits.shape[1:]
            )
            sampled = sample_categorical(
                None, logits, sampling_temperature, gumbel_noise=noise
            )
        sampled = jnp.where(resp_mask > 0, sampled, 0)
        out_levels.append(sampled)
        if n_known < model.n_resp_levels:
            buf = buf.at[..., n_known].set(sampled)

    return jnp.stack(out_levels, axis=-1)  # (B, Tr, 8)


@functools.partial(jax.jit, static_argnames=("model",))
def _forward_level_jit(model, params, text, tm, proms, pm, buf, rm, n_known):
    """Module-level jit so compilations cache across nar_generate calls
    (flax modules are hashable static args; all 7 levels share one program)."""
    return model.apply(
        params, text, tm, proms, pm, buf, rm, n_known,
        method=NAR.forward_level,
    )
