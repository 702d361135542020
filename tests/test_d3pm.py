"""D3PM math invariants (SURVEY §4): stochastic-matrix rows, cumulative
products, t=0 degeneracy of the posterior, forward-corruption behavior of the
absorbing chain, and sampler determinism under injected noise."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from tts_with_diffusion_model_tpu.diffusion import D3PM, cosine_beta_schedule
from tts_with_diffusion_model_tpu.diffusion.d3pm import (
    absorbing_transition_mat,
    uniform_transition_mat,
)

V = 17  # small odd vocab; absorbing state = 8
T = 10


def make():
    return D3PM.create(timesteps=T, num_classes=V, schedule="cosine",
                       transition="absorbing")


def test_cosine_schedule_shape_and_range():
    betas = cosine_beta_schedule(T + 1)
    assert betas.shape == (T + 1,)
    assert (betas >= 0).all() and (betas <= 0.999).all()
    # monotone increasing for the cosine schedule
    assert betas[-1] > betas[0]


def test_transition_matrices_are_stochastic():
    for mat in (absorbing_transition_mat(0.3, V), uniform_transition_mat(0.3, V)):
        np.testing.assert_allclose(mat.sum(axis=1), 1.0, atol=1e-12)
        assert (mat >= 0).all()


def test_cumulative_mats_are_stochastic():
    d = make()
    rows = np.asarray(d.q_mats).sum(axis=2)
    np.testing.assert_allclose(rows, 1.0, atol=1e-5)


def test_q_mats_match_explicit_product():
    d = make()
    q1 = np.asarray(d.q_onestep_mats, dtype=np.float64)
    expect = q1[0] @ q1[1] @ q1[2]
    np.testing.assert_allclose(np.asarray(d.q_mats[2]), expect, atol=1e-5)


def test_absorbing_mass_grows_with_t():
    d = make()
    x0 = jnp.array([[3, 5, 7]])
    p_early = d.q_probs(x0, jnp.array([0]))
    p_late = d.q_probs(x0, jnp.array([T - 1]))
    absorb = V // 2
    assert float(p_late[0, 0, absorb]) > float(p_early[0, 0, absorb])
    # diagonal mass shrinks
    assert float(p_late[0, 0, 3]) < float(p_early[0, 0, 3])


def test_q_posterior_t0_degeneracy_hard_x0():
    """At t=0 the posterior must equal log(one_hot(x0)+eps)
    (≡ ``ar_discrete.py:369-375``)."""
    d = make()
    x0 = jnp.array([[4, 9]])
    xt = jnp.array([[8, 8]])
    t = jnp.array([0])
    out = d.q_posterior_logits(x0, xt, t, x_start_logits=False)
    expect = jnp.log(jax.nn.one_hot(x0, V) + d.eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-6)


def test_q_posterior_t0_degeneracy_logits_x0():
    d = make()
    logits = jax.random.normal(jax.random.PRNGKey(0), (1, 2, V))
    xt = jnp.array([[8, 8]])
    out = d.q_posterior_logits(logits, xt, jnp.array([0]), x_start_logits=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(logits), atol=1e-6)


def test_q_posterior_matches_numpy_oracle():
    """Independent numpy recomputation of log q(x_{t-1}|x_t, x0)."""
    d = make()
    t = jnp.array([4])
    x0 = jnp.array([[3, 5]])
    xt = jnp.array([[8, 3]])
    got = np.asarray(d.q_posterior_logits(x0, xt, t, x_start_logits=False))

    q1 = np.asarray(d.q_onestep_mats, dtype=np.float64)
    qm = np.asarray(d.q_mats, dtype=np.float64)
    for w in range(2):
        fact1 = q1[4].T[int(xt[0, w])]  # row of Q_t^T at x_t
        fact2 = qm[3][int(x0[0, w])]    # row of cumulative mat at t-1
        expect = np.log(fact1 + d.eps) + np.log(fact2 + d.eps)
        np.testing.assert_allclose(got[0, w], expect, atol=1e-4)


def test_q_sample_deterministic_under_injected_noise():
    d = make()
    x0 = jnp.array([[3, 5, 7, 9]])
    t = jnp.array([5])
    noise = jnp.full((1, 4, V), 0.5)
    a = d.q_sample(x0, t, uniform_noise=noise)
    b = d.q_sample(x0, t, uniform_noise=noise)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_q_sample_t_large_mostly_absorbing():
    d = make()
    rng = jax.random.PRNGKey(0)
    x0 = jnp.full((1, 256), 3, jnp.int32)
    xt = d.q_sample(x0, jnp.array([T - 1]), rng=rng)
    frac_absorbed = float((xt == V // 2).mean())
    assert frac_absorbed > 0.5


def test_p_sample_t0_is_argmax_of_model_logits():
    d = make()
    logits = jax.random.normal(jax.random.PRNGKey(1), (1, 3, V))
    xt = jnp.array([[8, 8, 8]])
    out = d.p_sample(logits, jnp.array([0]), xt,
                     uniform_noise=jnp.full((1, 3, V), 0.5))
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(jnp.argmax(logits, axis=-1))
    )


@pytest.mark.slow
def test_diffusion_model_loss_and_generate():
    from tts_with_diffusion_model_tpu.models.diffusion import (
        DiffusionConfig,
        DiffusionModel,
    )

    cfg = DiffusionConfig(
        n_classes=V, d_model=16, n_heads=2, n_layers=1, timesteps=6,
        resp_len=12, text_len=5, prom_len=7, gen_len=9,
    )
    m = DiffusionModel(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = m.init(rng)

    B = 2
    batch = dict(
        text=jax.random.randint(rng, (B, 5), 1, V),
        text_mask=jnp.ones((B, 5)),
        proms=jax.random.randint(rng, (B, 7, 8), 0, V),
        prom_mask=jnp.ones((B, 7)),
        resp=jax.random.randint(rng, (B, 12), 0, V - 1),
        resp_mask=jnp.ones((B, 12)).at[1, 9:].set(0),
    )
    loss, stats = m.loss(params, batch, rng)
    assert jnp.isfinite(loss)

    loss_all, _ = m.loss(params, batch, rng, max_t=4)
    assert jnp.isfinite(loss_all)

    m_all = DiffusionModel(
        DiffusionConfig(**{**cfg.__dict__, "train_mode": "all_t"}),
        dtype=jnp.float32,
    )
    loss_ref, _ = m_all.loss(params, batch, rng)
    assert jnp.isfinite(loss_ref)

    out = m.generate(
        params, batch["text"], batch["text_mask"], batch["proms"],
        batch["prom_mask"], rng,
    )
    assert out.shape == (B, 12)
    # positions beyond gen_len stay 0
    assert int(out[:, 9:].sum()) == 0
    # generated tokens are valid classes
    assert int(out.min()) >= 0 and int(out.max()) < V


def test_remat_is_exact_and_train_knobs_are_wired():
    """Per-block gradient checkpointing (``remat``) must not change the
    loss or its gradients — it only changes what the backward pass stores
    vs recomputes.  Also pins the config wiring: ``gradient_checkpointing``
    and ``diffusion_train_mode`` reach the model via ``build_model``
    (round-1/2 lesson: no dead config knobs)."""
    from tts_with_diffusion_model_tpu.models.diffusion import (
        DiffusionConfig,
        DiffusionModel,
    )

    kw = dict(
        n_classes=V, d_model=16, n_heads=2, n_layers=2, timesteps=6,
        resp_len=12, text_len=5, prom_len=7, gen_len=9,
    )
    m0 = DiffusionModel(DiffusionConfig(**kw), dtype=jnp.float32)
    m1 = DiffusionModel(DiffusionConfig(**kw, remat=True), dtype=jnp.float32)
    rng = jax.random.PRNGKey(1)
    params = m0.init(rng)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        m1.init(rng)
    )

    B = 2
    batch = dict(
        text=jax.random.randint(rng, (B, 5), 1, V),
        text_mask=jnp.ones((B, 5)),
        proms=jax.random.randint(rng, (B, 7, 8), 0, V),
        prom_mask=jnp.ones((B, 7)),
        resp=jax.random.randint(rng, (B, 12), 0, V - 1),
        resp_mask=jnp.ones((B, 12)).at[1, 9:].set(0),
    )
    g0 = jax.grad(lambda p: m0.loss(p, batch, rng)[0])(params)
    g1 = jax.grad(lambda p: m1.loss(p, batch, rng)[0])(params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-6

    # the "dots" remat policy (save matmul outputs, recompute the rest)
    # changes only the store/recompute split — gradients stay exact
    mp = DiffusionModel(
        DiffusionConfig(**kw, remat=True, remat_policy="dots"),
        dtype=jnp.float32,
    )
    gp = jax.grad(lambda p: mp.loss(p, batch, rng)[0])(params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, gp
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-6
    with pytest.raises(ValueError, match="remat policy"):
        DiffusionModel(
            DiffusionConfig(**kw, remat=True, remat_policy="bogus"),
            dtype=jnp.float32,
        ).init(rng)

    # all_t (scan) path compiles and runs under remat too
    m2 = DiffusionModel(
        DiffusionConfig(**kw, remat=True, train_mode="all_t"),
        dtype=jnp.float32,
    )
    assert jnp.isfinite(m2.loss(params, batch, rng)[0])

    # config wiring through the train entrypoint's model builder
    from tts_with_diffusion_model_tpu.config import Config
    from tts_with_diffusion_model_tpu.train.train import build_model

    cfg = Config(
        model="diffusion",
        diffusion_train_mode="all_t",
        model_overrides=dict(d_model=16, n_heads=2, n_layers=1, timesteps=4),
    )
    m = build_model(cfg)
    assert m.config.train_mode == "all_t"
    assert m.config.remat is True  # gradient_checkpointing defaults on
    cfg2 = Config(model="diffusion", gradient_checkpointing=False,
                  model_overrides=dict(d_model=16, n_heads=2, n_layers=1))
    assert build_model(cfg2).config.remat is False
    cfgp = Config(model="diffusion", gradient_checkpointing_policy="dots",
                  model_overrides=dict(d_model=16, n_heads=2, n_layers=1))
    assert build_model(cfgp).config.remat_policy == "dots"
    assert build_model(
        Config(model="ar-quarter", gradient_checkpointing_policy="dots")
    ).remat_policy == "dots"

    # use_fp16 selects the compute dtype (bf16 default, fp32 when off) and
    # gradient_checkpointing reaches the AR/NAR family too
    cfg3 = Config(model="ar-quarter", use_fp16=False,
                  gradient_checkpointing=False)
    m3 = build_model(cfg3)
    assert m3.dtype == jnp.float32 and m3.remat is False
    assert build_model(Config(model="ar-quarter")).dtype == jnp.bfloat16


def test_serving_resp_bucket_property():
    """One definition of the tight serving bucket for every consumer
    (serve, CLI, bench): smallest 128-multiple covering gen_len, capped
    at resp_len."""
    from tts_with_diffusion_model_tpu.models.diffusion import DiffusionConfig

    assert DiffusionConfig().serving_resp_bucket == 384  # 350 → 384 < 448
    assert DiffusionConfig(resp_len=448, gen_len=400).serving_resp_bucket == 448
    assert DiffusionConfig(resp_len=48, gen_len=40).serving_resp_bucket == 48
    assert DiffusionConfig(resp_len=512, gen_len=128).serving_resp_bucket == 128


def test_structured_matches_dense_ops():
    """The closed-form structured path must agree with explicit dense
    matrices for both transition families."""
    import numpy as np

    for transition in ("absorbing", "uniform"):
        d = D3PM.create(timesteps=T, num_classes=V, schedule="cosine",
                        transition=transition)
        dense = D3PM.from_matrices(
            np.asarray(d.betas), np.asarray(d.q_onestep_mats, np.float64)
        )
        x0 = jnp.array([[3, 5, 16]])
        xt = jnp.array([[8, 8, 2]])
        t = jnp.array([4])

        np.testing.assert_allclose(
            np.asarray(d.q_probs(x0, t)),
            np.asarray(dense.q_probs(x0, t)),
            atol=1e-5, err_msg=transition,
        )
        got = d.q_posterior_logits(x0, xt, t, x_start_logits=False)
        want = dense.q_posterior_logits(x0, xt, t, x_start_logits=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, err_msg=transition)

        logits = jax.random.normal(jax.random.PRNGKey(0), (1, 3, V))
        got = d.q_posterior_logits(logits, xt, t, x_start_logits=True)
        want = dense.q_posterior_logits(logits, xt, t, x_start_logits=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, err_msg=transition)

        # t = 0 degeneracy path through the structured branch too
        got = d.q_posterior_logits(x0, xt, jnp.array([0]), x_start_logits=False)
        want = dense.q_posterior_logits(x0, xt, jnp.array([0]), x_start_logits=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_randomized_algebra_sweep():
    """Randomized property sweep over the full (schedule × transition)
    grid with varied vocab/horizon: cumulative mats equal the explicit
    one-step products, every operator row stays stochastic, and the
    posterior matches an independent numpy oracle at random (t, x0, xt).
    Fixed seeds — the point is breadth across configurations, not flake."""
    rng = np.random.default_rng(7)
    for schedule in ("cosine", "linear", "vpsde"):
        for transition in ("absorbing", "uniform"):
            for Vv, Tt in ((11, 6), (23, 13)):
                d = D3PM.create(timesteps=Tt, num_classes=Vv,
                                schedule=schedule, transition=transition)
                tag = f"{schedule}/{transition}/V={Vv},T={Tt}"
                q1 = np.asarray(d.q_onestep_mats, np.float64)
                qm = np.asarray(d.q_mats, np.float64)
                np.testing.assert_allclose(
                    q1.sum(2), 1.0, atol=1e-5, err_msg=tag)
                np.testing.assert_allclose(
                    qm.sum(2), 1.0, atol=1e-4, err_msg=tag)
                # cumulative = running product, checked at a random t
                t_chk = int(rng.integers(1, Tt))
                prod = q1[0]
                for i in range(1, t_chk + 1):
                    prod = prod @ q1[i]
                np.testing.assert_allclose(
                    qm[t_chk], prod, atol=1e-4, err_msg=tag)
                # posterior oracle at random positions
                t = int(rng.integers(1, Tt))
                x0 = rng.integers(0, Vv, (1, 3))
                xt = rng.integers(0, Vv, (1, 3))
                got = np.asarray(d.q_posterior_logits(
                    jnp.asarray(x0), jnp.asarray(xt), jnp.array([t]),
                    x_start_logits=False,
                ))
                for w in range(3):
                    expect = (
                        np.log(q1[t].T[xt[0, w]] + d.eps)
                        + np.log(qm[t - 1][x0[0, w]] + d.eps)
                    )
                    np.testing.assert_allclose(
                        got[0, w], expect, atol=1e-3, err_msg=tag)
                # interval diagonal ≡ ratio of cumulative diagonals
                s_i = int(rng.integers(0, Tt - 1))
                t_i = int(rng.integers(s_i + 1, Tt))
                diag = float(d._interval_diag(jnp.array(s_i), jnp.array(t_i)))
                cd = np.asarray(d.cum_diag, np.float64)
                np.testing.assert_allclose(
                    diag, cd[t_i] / cd[s_i], atol=1e-4, err_msg=tag)


def test_full_size_create_is_fast():
    """Production-size construction (V=1025, T=100) must be milliseconds —
    the closed form replaces the reference's 100 cumulative 1025² matmuls."""
    import time

    t0 = time.time()
    d = D3PM.create(timesteps=100, num_classes=1025)
    dt = time.time() - t0
    assert dt < 2.0, f"D3PM.create took {dt:.1f}s"
    assert d.cum_diag.shape == (100,)
    # rows of the cumulative operator still sum to 1
    s = float(d.cum_diag[50] + d.cum_off[50])
    assert abs(s - 1.0) < 1e-5


@pytest.mark.slow
def test_diffusion_overfit_and_recover():
    """Overfit a tiny D3PM on one sequence, then the reverse sampler must
    reconstruct it from the all-absorbing start — the diffusion analogue of
    the reference's one-sample overfit check (``nar.py:149-165``).  Guards
    against the no-positional-encoding symmetry failure (every position
    identical from the absorbing start; see models/dit.py denoise)."""
    import optax

    from tts_with_diffusion_model_tpu.models.diffusion import (
        DiffusionConfig,
        DiffusionModel,
    )

    Vv = 33
    cfg = DiffusionConfig(
        n_classes=Vv, d_model=64, n_heads=4, n_layers=2, timesteps=8,
        resp_len=16, text_len=6, prom_len=8, gen_len=16,
    )
    m = DiffusionModel(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = m.init(rng)
    tgt = jax.random.randint(jax.random.PRNGKey(5), (1, 16), 0, Vv - 1)
    batch = dict(
        text=jnp.full((1, 6), 3), text_mask=jnp.ones((1, 6)),
        proms=jnp.zeros((1, 8, 8), jnp.int32), prom_mask=jnp.ones((1, 8)),
        resp=tgt, resp_mask=jnp.ones((1, 16)),
    )
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, r):
        (l, _), g = jax.value_and_grad(
            lambda pp: m.loss(pp, batch, r), has_aux=True
        )(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    for i in range(400):
        rng, sub = jax.random.split(rng)
        params, opt, loss = step(params, opt, sub)

    out = m.generate(
        params, batch["text"], batch["text_mask"], batch["proms"],
        batch["prom_mask"], jax.random.PRNGKey(1),
    )
    acc = float((out[0] == tgt[0]).mean())
    assert float(loss) < 0.1, float(loss)
    assert acc > 0.7, acc


def test_strided_posterior_matches_onestep_at_stride1():
    """q_posterior_logits_strided(s = t-1) must equal the one-step posterior."""
    d = make()
    logits = jax.random.normal(jax.random.PRNGKey(2), (1, 3, V))
    xt = jnp.array([[8, 3, 8]])
    t = jnp.array([5])
    got = d.q_posterior_logits_strided(logits, xt, t, t - 1)
    want = d.q_posterior_logits(logits, xt, t, x_start_logits=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_interval_diag_is_product_of_onesteps():
    d = make()
    betas = np.asarray(d.betas)
    a = float(d._interval_diag(jnp.array([2]), jnp.array([5]))[0])
    expect = float(np.prod(1 - betas[3:6]))
    np.testing.assert_allclose(a, expect, rtol=1e-5)


@pytest.mark.slow
def test_strided_generation_recovers_overfit_sequence():
    """After overfitting, stride-2 sampling (half the steps) still recovers
    most of the target sequence."""
    import optax

    from tts_with_diffusion_model_tpu.models.diffusion import (
        DiffusionConfig,
        DiffusionModel,
    )

    Vv = 33
    cfg = DiffusionConfig(
        n_classes=Vv, d_model=64, n_heads=4, n_layers=2, timesteps=8,
        resp_len=16, text_len=6, prom_len=8, gen_len=16,
    )
    m = DiffusionModel(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = m.init(rng)
    tgt = jax.random.randint(jax.random.PRNGKey(5), (1, 16), 0, Vv - 1)
    batch = dict(
        text=jnp.full((1, 6), 3), text_mask=jnp.ones((1, 6)),
        proms=jnp.zeros((1, 8, 8), jnp.int32), prom_mask=jnp.ones((1, 8)),
        resp=tgt, resp_mask=jnp.ones((1, 16)),
    )
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, r):
        (l, _), g = jax.value_and_grad(
            lambda pp: m.loss(pp, batch, r), has_aux=True
        )(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    for i in range(400):
        rng, sub = jax.random.split(rng)
        params, opt, _ = step(params, opt, sub)

    out = m.generate(
        params, batch["text"], batch["text_mask"], batch["proms"],
        batch["prom_mask"], jax.random.PRNGKey(1), stride=2,
    )
    acc = float((out[0] == tgt[0]).mean())
    assert acc > 0.6, acc


def test_diffusion_generate_cohort_independent():
    """Per-row PRNG isolation at the model level: with per-row keys, a
    row's generated tokens do not depend on batch size or position
    (utils/rng.py — the serving micro-batcher relies on this)."""
    import jax

    from tts_with_diffusion_model_tpu.models.diffusion import (
        DiffusionConfig,
        DiffusionModel,
    )
    from tts_with_diffusion_model_tpu.utils.rng import row_keys_from_seeds

    cfg = DiffusionConfig(
        n_classes=33, d_model=16, n_heads=2, n_layers=1, timesteps=6,
        resp_len=12, text_len=4, prom_len=5, gen_len=10,
    )
    model = DiffusionModel(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))

    B = 3
    rng = np.random.default_rng(7)
    text = jnp.asarray(rng.integers(1, 33, (B, 4)), jnp.int32)
    tm = jnp.ones((B, 4), jnp.float32)
    proms = jnp.asarray(rng.integers(0, 33, (B, 5, 8)), jnp.int32)
    pm = jnp.ones((B, 5), jnp.float32)
    keys = row_keys_from_seeds([101, 202, 303])

    batched = np.asarray(
        model.generate(params, text, tm, proms, pm, keys)
    )
    for i in range(B):
        solo = np.asarray(model.generate(
            params, text[i : i + 1], tm[i : i + 1],
            proms[i : i + 1], pm[i : i + 1], keys[i : i + 1],
        ))
        np.testing.assert_array_equal(solo[0], batched[i])

    # stride-invariance of the noise stream is keyed by process timestep;
    # single-key (non-row) calls still work and split per row
    single = np.asarray(
        model.generate(params, text, tm, proms, pm, jax.random.PRNGKey(5))
    )
    assert single.shape == batched.shape


def test_generate_tight_bucket_bit_identical():
    """resp_bucket: a tighter generation bucket (serving uses the smallest
    128-multiple covering gen_len) must produce bit-identical tokens at the
    valid positions — pads are excluded from every attention/norm and the
    per-row noise draws are row-major prefix-stable."""
    import jax

    from tts_with_diffusion_model_tpu.models.diffusion import (
        DiffusionConfig,
        DiffusionModel,
    )
    from tts_with_diffusion_model_tpu.utils.rng import row_keys_from_seeds

    cfg = DiffusionConfig(
        n_classes=33, d_model=16, n_heads=2, n_layers=1, timesteps=6,
        resp_len=16, text_len=4, prom_len=5, gen_len=10,
    )
    model = DiffusionModel(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    B = 2
    text = jnp.asarray(rng.integers(1, 33, (B, 4)), jnp.int32)
    tm = jnp.ones((B, 4), jnp.float32)
    proms = jnp.asarray(rng.integers(0, 33, (B, 5, 8)), jnp.int32)
    pm = jnp.ones((B, 5), jnp.float32)
    keys = row_keys_from_seeds([7, 9])

    full = np.asarray(model.generate(params, text, tm, proms, pm, keys))
    tight = np.asarray(model.generate(params, text, tm, proms, pm, keys,
                                      resp_bucket=12))
    assert full.shape == (B, 16) and tight.shape == (B, 12)
    np.testing.assert_array_equal(tight[:, :10], full[:, :10])
    assert int(tight[:, 10:].sum()) == 0

    with pytest.raises(ValueError, match="resp_bucket"):
        model.generate(params, text, tm, proms, pm, keys, resp_bucket=8)


def test_maskgit_invariants_and_cohort_independence():
    """MaskGIT-style confidence decoding (generate_maskgit): shapes,
    zeroed padding, per-row cohort independence (a row's tokens are
    identical alone vs batched, so serving keeps per-request determinism),
    tight-bucket bit-identity, single-key fallback, and the
    absorbing-family guard."""
    from tts_with_diffusion_model_tpu.models.diffusion import (
        DiffusionConfig,
        DiffusionModel,
    )
    from tts_with_diffusion_model_tpu.utils.rng import row_keys_from_seeds

    cfg = DiffusionConfig(
        n_classes=33, d_model=16, n_heads=2, n_layers=1, timesteps=6,
        resp_len=16, text_len=4, prom_len=5, gen_len=10,
    )
    model = DiffusionModel(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    B = 3
    text = jnp.asarray(rng.integers(1, 33, (B, 4)), jnp.int32)
    tm = jnp.ones((B, 4), jnp.float32)
    proms = jnp.asarray(rng.integers(0, 33, (B, 5, 8)), jnp.int32)
    pm = jnp.ones((B, 5), jnp.float32)
    keys = row_keys_from_seeds([101, 202, 303])

    out = np.asarray(
        model.generate_maskgit(params, text, tm, proms, pm, keys, steps=4)
    )
    assert out.shape == (B, 16)
    assert int(out[:, 10:].sum()) == 0

    for i in range(B):
        solo = np.asarray(model.generate_maskgit(
            params, text[i:i + 1], tm[i:i + 1], proms[i:i + 1],
            pm[i:i + 1], keys[i:i + 1], steps=4,
        ))
        np.testing.assert_array_equal(solo[0], out[i])

    tight = np.asarray(model.generate_maskgit(
        params, text, tm, proms, pm, keys, steps=4, resp_bucket=12,
    ))
    assert tight.shape == (B, 12)
    np.testing.assert_array_equal(tight[:, :10], out[:, :10])

    single = np.asarray(model.generate_maskgit(
        params, text, tm, proms, pm, jax.random.PRNGKey(5), steps=4,
    ))
    assert single.shape == (B, 16)

    with pytest.raises(ValueError, match="steps"):
        model.generate_maskgit(params, text, tm, proms, pm, keys, steps=0)

    ucfg = DiffusionConfig(
        n_classes=33, d_model=16, n_heads=2, n_layers=1, timesteps=6,
        resp_len=16, text_len=4, prom_len=5, gen_len=10,
        transition="uniform",
    )
    um = DiffusionModel(ucfg, dtype=jnp.float32)
    with pytest.raises(ValueError, match="absorbing"):
        um.generate_maskgit(params, text, tm, proms, pm, keys, steps=4)


@pytest.mark.slow
def test_maskgit_recovers_overfit_sequence():
    """After overfitting one sequence, confidence decoding in 5 steps (vs
    the 8-step ancestral chain) still reconstructs it — the sampler is a
    valid decoder for the trained absorbing-state denoiser."""
    import optax

    from tts_with_diffusion_model_tpu.models.diffusion import (
        DiffusionConfig,
        DiffusionModel,
    )

    Vv = 33
    cfg = DiffusionConfig(
        n_classes=Vv, d_model=64, n_heads=4, n_layers=2, timesteps=8,
        resp_len=16, text_len=6, prom_len=8, gen_len=16,
    )
    m = DiffusionModel(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = m.init(rng)
    tgt = jax.random.randint(jax.random.PRNGKey(5), (1, 16), 0, Vv - 1)
    batch = dict(
        text=jnp.full((1, 6), 3), text_mask=jnp.ones((1, 6)),
        proms=jnp.zeros((1, 8, 8), jnp.int32), prom_mask=jnp.ones((1, 8)),
        resp=tgt, resp_mask=jnp.ones((1, 16)),
    )
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, r):
        (l, _), g = jax.value_and_grad(
            lambda pp: m.loss(pp, batch, r), has_aux=True
        )(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    for i in range(400):
        rng, sub = jax.random.split(rng)
        params, opt, _ = step(params, opt, sub)

    out = m.generate_maskgit(
        params, batch["text"], batch["text_mask"], batch["proms"],
        batch["prom_mask"], jax.random.PRNGKey(1), steps=5,
        temperature=0.0,
    )
    acc = float((out[0] == tgt[0]).mean())
    assert acc > 0.6, acc


def test_generate_depends_on_speaker_prompt():
    """The zero-shot-cloning pathway must be LIVE: swapping the acoustic
    prompt (proms) with everything else fixed — text, rng, masks — must
    change the generated codes, and the same prompt must reproduce them
    (round-3 VERDICT weak #2: a dead spkr cross-attention would fail
    nothing; trained-weight *effect* evidence lives in
    benchmarks/gen_r4/transfer_eval_v2.json)."""
    import numpy as np

    from tts_with_diffusion_model_tpu.models.diffusion import (
        DiffusionConfig,
        DiffusionModel,
    )

    cfg = DiffusionConfig(
        n_classes=V, d_model=16, n_heads=2, n_layers=1, timesteps=6,
        resp_len=12, text_len=5, prom_len=7, gen_len=9,
    )
    m = DiffusionModel(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = m.init(rng)

    B = 2
    text = jax.random.randint(jax.random.PRNGKey(1), (B, 5), 1, V)
    tm = jnp.ones((B, 5))
    pm = jnp.ones((B, 7))
    proms_a = jax.random.randint(jax.random.PRNGKey(2), (B, 7, 8), 0, V)
    proms_b = jax.random.randint(jax.random.PRNGKey(3), (B, 7, 8), 0, V)
    gen_rng = jax.random.PRNGKey(4)

    out_a = np.asarray(m.generate(params, text, tm, proms_a, pm, gen_rng))
    out_a2 = np.asarray(m.generate(params, text, tm, proms_a, pm, gen_rng))
    out_b = np.asarray(m.generate(params, text, tm, proms_b, pm, gen_rng))

    np.testing.assert_array_equal(out_a, out_a2)  # same prompt -> same codes
    assert (out_a[:, :9] != out_b[:, :9]).any(), (
        "generation ignored the speaker prompt"
    )
