"""Backbone unit tests: packed layout, masks, losses, AR/NAR shapes.

Locks in the behaviors SURVEY §4 lists as implicitly checked by the
reference: mask/merge correctness of the ragged ``text⧺sep⧺proms⧺resps``
layout (``base.py:427-443``), loss ignore regions (``base.py:451-476``), AR
stop-token pruning (``ar.py:107-111``), NAR level recursion shape invariants
(``nar.py:44-59``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_with_diffusion_model_tpu.models.base import (
    IGNORE_INDEX,
    build_targets,
    masked_cross_entropy,
    packed_layout,
    sample_categorical,
    sinusoidal_embedding,
)


def test_packed_layout_positions():
    tm = jnp.array([[1, 1, 0.0]])
    pm = jnp.array([[1, 0.0]])
    rm = jnp.array([[1, 1.0]])
    mask, pos, seg = packed_layout(tm, pm, rm)
    # layout: t t PAD sep p PAD sep r r
    np.testing.assert_array_equal(mask[0], [1, 1, 0, 1, 1, 0, 1, 1, 1])
    # packed positions: pads repeat the previous position but are masked out
    np.testing.assert_array_equal(pos[0], [0, 1, 1, 2, 3, 3, 4, 5, 6])
    np.testing.assert_array_equal(seg[0], [0, 0, 0, 1, 2, 2, 3, 4, 4])


def test_packed_equivalence_no_padding_vs_padding():
    """A padded batch must produce identical PE features at valid slots."""
    pos_padded = jnp.array([[0, 1, 1, 2, 3]])
    pos_packed = jnp.array([[0, 1, 2, 3]])
    e1 = sinusoidal_embedding(pos_padded, 8)[0]
    e2 = sinusoidal_embedding(pos_packed, 8)[0]
    np.testing.assert_allclose(e1[np.array([0, 1, 3, 4])], e2, rtol=1e-6)


def test_build_targets_ar_shift():
    text = jnp.array([[5, 6, 7, 0]])
    tm = jnp.array([[1, 1, 1, 0.0]])
    pm = jnp.array([[1, 1.0]])
    targ = jnp.array([[10, 11, 12, 0]])
    rm = jnp.array([[1, 1, 1, 0.0]])
    t = build_targets(
        text, tm, pm, targ, rm, resp_loss_only=False, shift=True, stop_token=99
    )
    ig = IGNORE_INDEX
    # layout: text(4) sep prom(2) sep resp(4)
    expected = [6, 7, ig, ig, ig, ig, ig, 10, 11, 12, 99, ig]
    np.testing.assert_array_equal(np.asarray(t[0]), expected)


def test_build_targets_nar_no_shift():
    text = jnp.array([[5, 6]])
    tm = jnp.array([[1, 1.0]])
    pm = jnp.array([[1.0]])
    targ = jnp.array([[10, 11, 0]])
    rm = jnp.array([[1, 1, 0.0]])
    t = build_targets(
        text, tm, pm, targ, rm, resp_loss_only=True, shift=False, stop_token=None
    )
    ig = IGNORE_INDEX
    expected = [ig, ig, ig, ig, ig, 10, 11, ig]
    np.testing.assert_array_equal(np.asarray(t[0]), expected)


def test_masked_cross_entropy_matches_manual():
    logits = jnp.array([[[2.0, 0.0, 0.0], [0.0, 2.0, 0.0]]])
    targets = jnp.array([[0, IGNORE_INDEX]])
    got = masked_cross_entropy(logits, targets)
    logp = jax.nn.log_softmax(logits[0, 0])
    np.testing.assert_allclose(got, -logp[0], rtol=1e-6)


def test_sample_categorical_greedy_and_injected_noise():
    logits = jnp.array([[0.0, 3.0, 1.0]])
    assert int(sample_categorical(None, logits, temperature=0.0)[0]) == 1
    noise = jnp.zeros((1, 3))
    assert int(sample_categorical(None, logits, 1.0, gumbel_noise=noise)[0]) == 1
    # Noise large enough on index 2 flips the sample deterministically.
    noise = jnp.array([[0.0, 0.0, 10.0]])
    assert int(sample_categorical(None, logits, 1.0, gumbel_noise=noise)[0]) == 2


@pytest.fixture(scope="module")
def tiny_batch():
    rng = jax.random.PRNGKey(0)
    B, Tt, Tp, Tr, V = 2, 6, 8, 5, 32
    text = jax.random.randint(rng, (B, Tt), 1, V)
    tm = jnp.ones((B, Tt)).at[1, 4:].set(0)
    proms = jax.random.randint(rng, (B, Tp, 8), 0, V)
    pm = jnp.ones((B, Tp)).at[1, 6:].set(0)
    resps = jax.random.randint(rng, (B, Tr, 8), 0, V)
    rm = jnp.ones((B, Tr)).at[1, 3:].set(0)
    return dict(text=text, tm=tm, proms=proms, pm=pm, resps=resps, rm=rm, V=V)


def test_ar_forward_and_loss(tiny_batch):
    from tts_with_diffusion_model_tpu.models import AR

    b = tiny_batch
    m = AR(n_tokens=b["V"], d_model=32, n_heads=4, n_layers=2, remat=False)
    rng = jax.random.PRNGKey(1)
    resp = b["resps"][..., 0]
    params = m.init(rng, b["text"], b["tm"], b["proms"], b["pm"], resp, b["rm"])
    logits, losses = m.apply(
        params, b["text"], b["tm"], b["proms"], b["pm"], resp, b["rm"]
    )
    T = b["text"].shape[1] + 1 + b["proms"].shape[1] + 1 + resp.shape[1]
    assert logits.shape == (2, T, b["V"] + 1)
    assert jnp.isfinite(losses["nll"])


def test_ar_remat_matches_no_remat(tiny_batch):
    from tts_with_diffusion_model_tpu.models import AR

    b = tiny_batch
    resp = b["resps"][..., 0]
    args = (b["text"], b["tm"], b["proms"], b["pm"], resp, b["rm"])
    rng = jax.random.PRNGKey(1)
    m1 = AR(n_tokens=b["V"], d_model=32, n_heads=4, n_layers=2, remat=False)
    m2 = AR(n_tokens=b["V"], d_model=32, n_heads=4, n_layers=2, remat=True)
    params = m1.init(rng, *args)
    l1, _ = m1.apply(params, *args)
    l2, _ = m2.apply(params, *args)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)

    g1 = jax.grad(lambda p: m1.apply(p, *args)[1]["nll"])(params)
    g2 = jax.grad(lambda p: m2.apply(p, *args)[1]["nll"])(params)
    leaves1 = jax.tree.leaves(g1)
    leaves2 = jax.tree.leaves(g2)
    for a, c in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-2)


def test_ar_generate_kv_cache_matches_full_forward(tiny_batch):
    """The KV-cache decode must produce the same logits as a teacher-forced
    full forward over the same tokens (the reference's full-prefix recompute
    oracle, ``ar.py:155-166``)."""
    from tts_with_diffusion_model_tpu.models import AR
    from tts_with_diffusion_model_tpu.models.ar import ar_generate

    b = tiny_batch
    resp = b["resps"][..., 0]
    rng = jax.random.PRNGKey(2)
    m = AR(n_tokens=b["V"], d_model=32, n_heads=4, n_layers=2, remat=False,
           dtype=jnp.float32)
    params = m.init(rng, b["text"], b["tm"], b["proms"], b["pm"], resp, b["rm"])

    # Greedy generation via the cache path
    toks, lens = ar_generate(
        m, params, b["text"], b["tm"], b["proms"], b["pm"], rng,
        max_steps=4, sampling_temperature=0.0,
    )
    assert toks.shape == (2, 4)

    # Oracle: feed the generated prefix teacher-forced; the logits at the
    # last resp position must argmax to the same next token.
    gen = toks[:, :3]
    gm = jnp.ones_like(gen, dtype=jnp.float32)
    logits, _ = m.apply(
        params, b["text"], b["tm"], b["proms"], b["pm"], gen, gm
    )
    next_from_full = jnp.argmax(logits[:, -1, :], axis=-1)
    np.testing.assert_array_equal(np.asarray(next_from_full), np.asarray(toks[:, 3]))


def test_nar_train_and_generate(tiny_batch):
    from tts_with_diffusion_model_tpu.models import NAR
    from tts_with_diffusion_model_tpu.models.nar import nar_generate

    b = tiny_batch
    m = NAR(n_tokens=b["V"], d_model=32, n_heads=4, n_layers=2, remat=False)
    rng = jax.random.PRNGKey(3)
    ql = jnp.array([0, 3])
    params = m.init(
        rng, b["text"], b["tm"], b["proms"], b["pm"], b["resps"], b["rm"], ql
    )
    logits, losses = m.apply(
        params, b["text"], b["tm"], b["proms"], b["pm"], b["resps"], b["rm"], ql
    )
    assert jnp.isfinite(losses["nll"])

    out = nar_generate(
        m, params, b["text"], b["tm"], b["proms"], b["pm"],
        b["resps"][..., 0], b["rm"], rng,
    )
    assert out.shape == (2, b["resps"].shape[1], 8)
    # level 0 is passed through unchanged
    np.testing.assert_array_equal(np.asarray(out[..., 0]), np.asarray(b["resps"][..., 0]))
    # padded positions stay 0 on generated levels
    assert int(out[1, 3:, 1:].sum()) == 0


def test_ar_generate_reproducible_with_same_key(tiny_batch):
    """Fixed-seed sampling determinism (BASELINE parity requirement as
    defined in DESIGN.md §8: same weights + same key → same tokens)."""
    from tts_with_diffusion_model_tpu.models import AR
    from tts_with_diffusion_model_tpu.models.ar import ar_generate

    b = tiny_batch
    resp = b["resps"][..., 0]
    rng = jax.random.PRNGKey(7)
    m = AR(n_tokens=b["V"], d_model=32, n_heads=4, n_layers=2, remat=False,
           dtype=jnp.float32)
    params = m.init(rng, b["text"], b["tm"], b["proms"], b["pm"], resp, b["rm"])
    t1, l1 = ar_generate(m, params, b["text"], b["tm"], b["proms"], b["pm"],
                         jax.random.PRNGKey(42), max_steps=5)
    t2, l2 = ar_generate(m, params, b["text"], b["tm"], b["proms"], b["pm"],
                         jax.random.PRNGKey(42), max_steps=5)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
