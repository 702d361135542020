"""Speculative AR decoding (models/ar.py ar_generate_speculative).

The load-bearing property: under greedy verification the output is
token-identical to the target's own greedy decode for ANY draft — the
draft can only change speed, never content.  Also checks the chunked
verify forward against the sequential decode path and per-row
reproducibility across batch cohorts at temperature > 0.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tts_with_diffusion_model_tpu.models import AR
from tts_with_diffusion_model_tpu.models.ar import (
    ar_generate,
    ar_generate_speculative,
)
from tts_with_diffusion_model_tpu.utils.rng import row_keys_from_seeds

V = 48


def _make(seed, d_model=32, n_layers=2):
    m = AR(n_tokens=V, d_model=d_model, n_heads=4, n_layers=n_layers,
           remat=False, dtype=jnp.float32, p_dropout=0.0)
    rng = jax.random.PRNGKey(seed)
    B, Tt, Tp, Tr = 2, 5, 7, 4
    text = jax.random.randint(jax.random.PRNGKey(100 + seed), (B, Tt), 1, V)
    tm = jnp.ones((B, Tt), jnp.float32).at[1, 4:].set(0)  # ragged row
    proms = jax.random.randint(jax.random.PRNGKey(200 + seed), (B, Tp, 8), 0, V)
    pm = jnp.ones((B, Tp), jnp.float32).at[1, 5:].set(0)
    params = m.init(rng, text, tm, proms, pm,
                    jnp.zeros((B, Tr), jnp.int32), jnp.ones((B, Tr)))
    return m, params, (text, tm, proms, pm)


def test_decode_chunk_matches_sequential_steps():
    """The chunked verify forward is numerically the sequential cached
    decode: same logits for the same teacher-forced tokens."""
    m, params, (text, tm, proms, pm) = _make(0)
    B = text.shape[0]
    W = 4
    total = text.shape[1] + 1 + proms.shape[1] + 1 + W

    _, cache = m.apply(params, text, tm, proms, pm, total, method=AR.prefill)
    toks = jax.random.randint(jax.random.PRNGKey(3), (B, W), 0, V)

    seq_logits = []
    c = cache
    for j in range(W):
        lg, c = m.apply(params, toks[:, j], c, method=AR.decode_step)
        seq_logits.append(lg)
    seq_logits = jnp.stack(seq_logits, axis=1)  # (B, W, V+1)

    chunk_logits, c2 = m.apply(
        params, toks, cache["pos"], cache, method=AR.decode_chunk
    )
    np.testing.assert_allclose(
        np.asarray(chunk_logits), np.asarray(seq_logits), atol=2e-4
    )
    # cache bookkeeping advanced identically
    assert int(c2["index"]) == int(c["index"])
    np.testing.assert_array_equal(np.asarray(c2["mask"]), np.asarray(c["mask"]))


def _greedy_equal(target, t_params, draft, d_params, inputs, k, max_steps=12):
    text, tm, proms, pm = inputs
    rng = jax.random.PRNGKey(0)
    ref_toks, ref_len = ar_generate(
        target, t_params, text, tm, proms, pm, rng,
        max_steps=max_steps, sampling_temperature=0.0,
    )
    sp_toks, sp_len = ar_generate_speculative(
        target, t_params, draft, d_params, text, tm, proms, pm, rng,
        max_steps=max_steps, k=k, sampling_temperature=0.0,
    )
    np.testing.assert_array_equal(np.asarray(sp_len), np.asarray(ref_len))
    for b in range(text.shape[0]):
        n = int(ref_len[b])
        n = max(n, 1)
        np.testing.assert_array_equal(
            np.asarray(sp_toks[b, :n]), np.asarray(ref_toks[b, :n]),
            err_msg=f"row {b}",
        )


def test_speculative_greedy_exact_with_random_draft():
    """ANY draft (here: independently initialized, different depth) must
    yield the target's exact greedy decode — rejections are replaced by
    the target argmax, so the draft only affects round counts."""
    target, t_params, inputs = _make(0)
    draft, d_params, _ = _make(7, d_model=32, n_layers=1)
    _greedy_equal(target, t_params, draft, d_params, inputs, k=3)


def test_speculative_greedy_exact_with_perfect_draft():
    """draft == target: every proposal is accepted (the all-accept /
    bonus-token path) and the output is still the exact greedy decode."""
    target, t_params, inputs = _make(0)
    _greedy_equal(target, t_params, target, t_params, inputs, k=4)


def test_speculative_k1_and_temperature_paths():
    """k=1 boundary and the stochastic accept/residual path: valid tokens,
    stop-pruned lengths, and per-row reproducibility — a row's output is
    identical alone and inside a batch cohort (per-row keys)."""
    target, t_params, (text, tm, proms, pm) = _make(0)
    draft, d_params, _ = _make(5, n_layers=1)

    keys = row_keys_from_seeds([11, 22])
    toks, lens = ar_generate_speculative(
        target, t_params, draft, d_params, text, tm, proms, pm, keys,
        max_steps=10, k=1, sampling_temperature=1.0,
    )
    assert toks.shape == (2, 10)
    assert int(toks.min()) >= 0 and int(toks.max()) <= V  # V = stop token
    assert (np.asarray(lens) <= 10).all()

    # row 0 alone (same per-row seed) commits the same tokens
    solo, solo_len = ar_generate_speculative(
        target, t_params, draft, d_params,
        text[:1], tm[:1], proms[:1], pm[:1], row_keys_from_seeds([11]),
        max_steps=10, k=1, sampling_temperature=1.0,
    )
    assert int(solo_len[0]) == int(lens[0])
    n = max(int(lens[0]), 1)
    np.testing.assert_array_equal(
        np.asarray(solo[0, :n]), np.asarray(toks[0, :n])
    )


def test_speculative_stats_accounting():
    """with_stats: committed counts include the prefill token, each round
    commits accepted-drafts + 1, and the perfect draft accepts everything
    (accepted_per_round == k+1 until the stop token lands)."""
    target, t_params, (text, tm, proms, pm) = _make(0)
    k = 4
    toks, lens, stats = ar_generate_speculative(
        target, t_params, target, t_params, text, tm, proms, pm,
        jax.random.PRNGKey(0), max_steps=12, k=k,
        sampling_temperature=0.0, with_stats=True,
    )
    rounds = int(stats["rounds"])
    committed = np.asarray(stats["committed"])
    assert rounds >= 1
    # every row: y0 + per-round commits, capped at max_steps
    assert (committed >= 1).all() and (committed <= 12).all()
    # perfect draft: all k accepted every full round → the slowest row
    # advances k+1 per round (modulo the final truncated round)
    assert committed.max() - 1 >= min(12 - 1, (rounds - 1) * (k + 1))
    # greedy identity is preserved regardless of stats plumbing
    ref_toks, ref_lens = ar_generate(
        target, t_params, text, tm, proms, pm, jax.random.PRNGKey(0),
        max_steps=12, sampling_temperature=0.0,
    )
    for b in range(2):
        n = int(ref_lens[b])
        assert int(lens[b]) == n
        np.testing.assert_array_equal(
            np.asarray(toks[b, :n]), np.asarray(ref_toks[b, :n])
        )
