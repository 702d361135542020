"""Engine/trainer tests: optimizer schedule parity, train-step mechanics,
checkpoint round-trip, one-sample overfit (the port of the reference's
``nar.py example_usage`` convergence check, SURVEY §4), and a multi-device
dp×tp mesh step on the 8-device CPU harness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_with_diffusion_model_tpu.models import AR
from tts_with_diffusion_model_tpu.parallel.mesh import build_mesh
from tts_with_diffusion_model_tpu.train.engine import (
    Engine,
    warmup_decay_schedule,
)

OPT_CFG = {
    "scheduler": {
        "warmup_min_lr": 1e-9,
        "warmup_max_lr": 1e-3,
        "warmup_num_steps": 10,
        "total_num_steps": 100,
    },
    "gradient_clipping": 1.0,
    "gradient_accumulation_steps": 1,
}


def test_warmup_decay_schedule():
    s = warmup_decay_schedule(1e-9, 1e-3, 10, 100)
    assert float(s(0)) == pytest.approx(1e-9, rel=0.05)
    assert float(s(10)) == pytest.approx(1e-3, rel=1e-5)
    assert float(s(55)) == pytest.approx(5e-4, rel=1e-4)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-12)


def make_tiny(mesh=None, n_layers=2):
    V = 32
    m = AR(n_tokens=V, d_model=32, n_heads=4, n_layers=n_layers, remat=False,
           dtype=jnp.float32, p_dropout=0.0)
    rng = jax.random.PRNGKey(0)
    B, Tt, Tp, Tr = 4, 6, 8, 10
    batch = dict(
        text=np.random.default_rng(0).integers(1, V, (B, Tt)).astype(np.int32),
        text_mask=np.ones((B, Tt), np.float32),
        proms=np.random.default_rng(1).integers(0, V, (B, Tp, 8)).astype(np.int32),
        prom_mask=np.ones((B, Tp), np.float32),
        resp=np.random.default_rng(2).integers(0, V, (B, Tr)).astype(np.int32),
        resp_mask=np.ones((B, Tr), np.float32),
    )
    params = m.init(
        rng,
        jnp.asarray(batch["text"]),
        jnp.asarray(batch["text_mask"]),
        jnp.asarray(batch["proms"]),
        jnp.asarray(batch["prom_mask"]),
        jnp.asarray(batch["resp"]),
        jnp.asarray(batch["resp_mask"]),
    )

    def loss_fn(params, b, rng):
        _, losses = m.apply(
            params, b["text"], b["text_mask"], b["proms"], b["prom_mask"],
            b["resp"], b["resp_mask"],
        )
        return sum(losses.values()), losses

    return m, params, loss_fn, batch


def test_engine_step_and_stats(tmp_path):
    _, params, loss_fn, batch = make_tiny()
    eng = Engine("model", params, loss_fn, OPT_CFG, tmp_path, mesh=build_mesh(1, 1, jax.devices()[:1]))
    stats = eng.train_batch(batch, jax.random.PRNGKey(0))
    assert "model.loss" in stats and np.isfinite(stats["model.loss"])
    assert "grad_norm" in stats and stats["grad_norm"] > 0
    assert eng.global_step == 1


def test_engine_overfit_one_batch(tmp_path):
    """Loss must drop substantially when overfitting a single batch
    (≡ the 200-step overfit in ``nar.py:149-165``, shortened)."""
    _, params, loss_fn, batch = make_tiny()
    cfg = {**OPT_CFG, "scheduler": {**OPT_CFG["scheduler"],
           "warmup_max_lr": 3e-3, "warmup_num_steps": 5,
           "total_num_steps": 10000}}
    eng = Engine("model", params, loss_fn, cfg, tmp_path,
                 mesh=build_mesh(1, 1, jax.devices()[:1]))
    first = None
    for i in range(60):
        stats = eng.train_batch(batch, jax.random.PRNGKey(i))
        if first is None:
            first = stats["model.loss"]
    assert stats["model.loss"] < first * 0.5, (first, stats["model.loss"])


def test_engine_checkpoint_roundtrip(tmp_path):
    _, params, loss_fn, batch = make_tiny()
    eng = Engine("model", params, loss_fn, OPT_CFG, tmp_path,
                 mesh=build_mesh(1, 1, jax.devices()[:1]))
    eng.train_batch(batch, jax.random.PRNGKey(0))
    eng.train_batch(batch, jax.random.PRNGKey(1))
    eng.save_checkpoint()

    eng2 = Engine("model", params, loss_fn, OPT_CFG, tmp_path,
                  mesh=build_mesh(1, 1, jax.devices()[:1]))
    assert eng2.load_checkpoint()
    assert eng2.global_step == 2
    a = jax.tree.leaves(eng.params)[0]
    b = jax.tree.leaves(eng2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_engine_checkpoint_retention_and_pinned_restore(tmp_path):
    """``keep`` prunes to the newest N step dirs; ``step=`` restores an
    exact checkpoint (post-hoc export at a chosen eval tick) and a missing
    pinned step raises instead of silently starting fresh."""
    _, params, loss_fn, batch = make_tiny()
    eng = Engine("model", params, loss_fn, OPT_CFG, tmp_path,
                 mesh=build_mesh(1, 1, jax.devices()[:1]))
    for i in range(4):
        eng.train_batch(batch, jax.random.PRNGKey(i))
        eng.save_checkpoint(keep=10)
    ckdir = tmp_path / "model"
    assert sorted(p.name for p in ckdir.glob("step_*")) == [
        f"step_{s:08d}" for s in (1, 2, 3, 4)
    ]

    eng2 = Engine("model", params, loss_fn, OPT_CFG, tmp_path,
                  mesh=build_mesh(1, 1, jax.devices()[:1]))
    assert eng2.load_checkpoint(step=2)
    assert eng2.global_step == 2

    with pytest.raises(FileNotFoundError, match="restore_step=7"):
        eng2.load_checkpoint(step=7)

    # retention: keep=2 prunes the oldest dirs on the next save
    eng.train_batch(batch, jax.random.PRNGKey(9))
    eng.save_checkpoint(keep=2)
    assert sorted(p.name for p in ckdir.glob("step_*")) == [
        f"step_{s:08d}" for s in (4, 5)
    ]


def test_engine_multichip_dp_tp_mesh(tmp_path):
    """Full train step over a 4×2 dp×tp mesh on 8 virtual CPU devices —
    the sharding path the driver's dryrun_multichip validates."""
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = build_mesh(4, 2)
    _, params, loss_fn, batch = make_tiny()
    eng = Engine("model", params, loss_fn, OPT_CFG, tmp_path, mesh=mesh)
    stats = eng.train_batch(batch, jax.random.PRNGKey(0))
    assert np.isfinite(stats["model.loss"])
    # a second step exercises donated buffers
    stats = eng.train_batch(batch, jax.random.PRNGKey(1))
    assert np.isfinite(stats["model.loss"])
    # params carrying tp shardings: qkv kernel second axis split over tp
    qkv = eng.params["params"]["base"]["block_0"]["attn"]["to_qkv"]["kernel"]
    spec = qkv.sharding.spec
    assert "tp" in str(spec)


def test_engine_zero1_optimizer_sharding(tmp_path):
    """ZeRO-1 optimizer-state sharding: identical training trajectory to
    the replicated engine, Adam moments physically sharded over dp (each
    device holds 1/dp of the moment bytes), and checkpoint round-trip."""
    assert len(jax.devices()) == 8
    mesh = build_mesh(4, 2)
    _, params, loss_fn, batch = make_tiny()
    eng = Engine("model", params, loss_fn, OPT_CFG, tmp_path / "rep", mesh=mesh)
    zng = Engine("model", params, loss_fn, OPT_CFG, tmp_path / "z1",
                 mesh=mesh, zero1=True)
    for i in range(3):
        s0 = eng.train_batch(batch, jax.random.PRNGKey(i))
        s1 = zng.train_batch(batch, jax.random.PRNGKey(i))
        assert s1["model.loss"] == pytest.approx(s0["model.loss"], rel=1e-5)
    for a, b in zip(jax.tree.leaves(eng.params), jax.tree.leaves(zng.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # moments are dp-sharded: some ≥1-d leaf's addressable shard is 1/4 of
    # the full array, and the sharding spec names the dp axis
    sharded = both = 0
    for leaf in jax.tree.leaves(zng.opt_state):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.size > 1:
            spec = str(leaf.sharding.spec)
            if "dp" in spec:
                shard = leaf.addressable_shards[0].data
                expect = 4 * (2 if "tp" in spec else 1)
                assert shard.size * expect == leaf.size, (leaf.shape, spec)
                sharded += 1
            if "dp" in spec and "tp" in spec:
                both += 1
    assert sharded > 0, "no optimizer moment was dp-sharded"
    # moments that inherited a tp layout from their param keep it and gain
    # dp on another axis (r3 review: zero1 must never *undo* tp sharding)
    assert both > 0, "no moment is sharded over both dp and tp"
    # while the baseline engine's moments are never dp-sharded (they may
    # carry tp shardings inherited from the params they mirror)
    for leaf in jax.tree.leaves(eng.opt_state):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.size > 1:
            assert "dp" not in str(leaf.sharding.spec)

    # checkpoint round-trip restores onto the zero1 shardings
    zng.save_checkpoint()
    zng2 = Engine("model", params, loss_fn, OPT_CFG, tmp_path / "z1",
                  mesh=mesh, zero1=True)
    assert zng2.load_checkpoint()
    assert zng2.global_step == 3
    s2 = zng2.train_batch(batch, jax.random.PRNGKey(99))
    assert np.isfinite(s2["model.loss"])


def test_engine_ema_params(tmp_path):
    """EMA tracking: matches the closed-form recursion over the actual
    param trajectory, checkpoints round-trip it, and toggling ema_decay
    across a resume degrades gracefully in both directions."""
    _, params, loss_fn, batch = make_tiny()
    mesh1 = build_mesh(1, 1, jax.devices()[:1])
    eng = Engine("model", params, loss_fn, OPT_CFG, tmp_path / "a",
                 mesh=mesh1, ema_decay=0.9)

    def leaf(tree):
        return np.asarray(jax.tree.leaves(tree)[0], np.float64)

    expected = leaf(eng.params)  # ema starts as a copy of params
    for i in range(3):
        eng.train_batch(batch, jax.random.PRNGKey(i))
        expected = 0.9 * expected + 0.1 * leaf(eng.params)
    np.testing.assert_allclose(leaf(eng.ema_params), expected, rtol=1e-5)
    # the average genuinely lags the raw params
    assert float(np.abs(leaf(eng.ema_params) - leaf(eng.params)).max()) > 0

    eng.save_checkpoint()
    eng2 = Engine("model", params, loss_fn, OPT_CFG, tmp_path / "a",
                  mesh=mesh1, ema_decay=0.9)
    assert eng2.load_checkpoint()
    np.testing.assert_allclose(leaf(eng2.ema_params), leaf(eng.ema_params))

    # ema checkpoint → non-ema engine: restores, discards the average
    eng3 = Engine("model", params, loss_fn, OPT_CFG, tmp_path / "a",
                  mesh=mesh1)
    assert eng3.load_checkpoint()
    assert eng3.ema_params is None
    np.testing.assert_allclose(leaf(eng3.params), leaf(eng.params))

    # non-ema checkpoint → ema engine: seeds the average from params
    eng4 = Engine("model", params, loss_fn, OPT_CFG, tmp_path / "b", mesh=mesh1)
    eng4.train_batch(batch, jax.random.PRNGKey(0))
    eng4.save_checkpoint()
    eng5 = Engine("model", params, loss_fn, OPT_CFG, tmp_path / "b",
                  mesh=mesh1, ema_decay=0.9)
    assert eng5.load_checkpoint()
    np.testing.assert_allclose(leaf(eng5.ema_params), leaf(eng5.params))


def test_engine_freeze_filter(tmp_path):
    """Frozen subtrees receive zero updates (≡ Engine.freeze, engines.py:25-34)."""
    _, params, loss_fn, batch = make_tiny()
    eng = Engine(
        "model", params, loss_fn, OPT_CFG, tmp_path,
        mesh=build_mesh(1, 1, jax.devices()[:1]),
        trainable_filter=lambda path: "text_emb" not in path,
    )
    before = np.asarray(
        eng.params["params"]["base"]["text_emb"]["embedding"]
    ).copy()
    other_before = np.asarray(
        eng.params["params"]["base"]["classifier"]["kernel"]
    ).copy()
    for i in range(3):
        eng.train_batch(batch, jax.random.PRNGKey(i))
    after = np.asarray(eng.params["params"]["base"]["text_emb"]["embedding"])
    other_after = np.asarray(eng.params["params"]["base"]["classifier"]["kernel"])
    np.testing.assert_array_equal(before, after)
    assert np.abs(other_after - other_before).max() > 0


def test_engine_gradient_accumulation(tmp_path):
    """optax.MultiSteps accumulation: params change only every k steps
    (reference knob gradient_accumulation_steps, config.py:66)."""
    _, params, loss_fn, batch = make_tiny()
    cfg = {**OPT_CFG, "gradient_accumulation_steps": 2}
    eng = Engine("model", params, loss_fn, cfg, tmp_path,
                 mesh=build_mesh(1, 1, jax.devices()[:1]))
    p0 = np.asarray(eng.params["params"]["base"]["classifier"]["kernel"]).copy()
    eng.train_batch(batch, jax.random.PRNGKey(0))
    p1 = np.asarray(eng.params["params"]["base"]["classifier"]["kernel"])
    np.testing.assert_array_equal(p0, p1)  # first micro-step: no update yet
    eng.train_batch(batch, jax.random.PRNGKey(1))
    p2 = np.asarray(eng.params["params"]["base"]["classifier"]["kernel"])
    assert np.abs(p2 - p0).max() > 0  # applied after k micro-steps


def test_engine_diagnose(tmp_path):
    from tts_with_diffusion_model_tpu.utils.diagnostic import Diagnostic

    _, params, loss_fn, batch = make_tiny()
    eng = Engine("model", params, loss_fn, OPT_CFG, tmp_path,
                 mesh=build_mesh(1, 1, jax.devices()[:1]))
    diag = Diagnostic(log_dir=tmp_path)
    eng.diagnose(batch, jax.random.PRNGKey(0), diag)
    df = diag.table()
    names = set(df["name"])
    assert any(n.startswith("grad.") for n in names)
    assert any(n.startswith("param.") for n in names)
    assert (df["rms_p50"] >= 0).all()


def test_engines_multi_engine_step(tmp_path):
    """Engines with two engines steps both and merges stats (the reference's
    multi-engine GAN support, engines.py:126-166)."""
    from tts_with_diffusion_model_tpu.train.engine import Engines

    _, p1, loss_fn, batch = make_tiny()
    _, p2, _, _ = make_tiny()
    mesh = build_mesh(1, 1, jax.devices()[:1])
    engines = Engines(
        gen=Engine("gen", p1, loss_fn, OPT_CFG, tmp_path, mesh=mesh),
        dis=Engine("dis", p2, loss_fn, OPT_CFG, tmp_path, mesh=mesh),
    )

    class _Cfg:
        seed = 0
        save_on_oom = True

    engines.setup(_Cfg())
    stats = engines.step(batch=batch)
    assert "gen.loss" in stats and "dis.loss" in stats
    assert stats["global_step"] == 1
    assert "elapsed_time" in stats

    engines.save_checkpoint()
    engines2 = Engines(
        gen=Engine("gen", p1, loss_fn, OPT_CFG, tmp_path, mesh=mesh),
        dis=Engine("dis", p2, loss_fn, OPT_CFG, tmp_path, mesh=mesh),
    )
    engines2.setup(_Cfg())
    engines2.load_checkpoint()
    assert engines2.global_step == 1


def test_engines_async_stats(tmp_path):
    """cfg.async_stats=True: stats arrive one step late with their own
    global_step, and no step blocks on the device (VERDICT round-1 weak #5)."""
    from tts_with_diffusion_model_tpu.train.engine import Engines

    _, p1, loss_fn, batch = make_tiny()
    mesh = build_mesh(1, 1, jax.devices()[:1])
    engines = Engines(m=Engine("m", p1, loss_fn, OPT_CFG, tmp_path, mesh=mesh))

    class _Cfg:
        seed = 0
        save_on_oom = True
        async_stats = True

    engines.setup(_Cfg())
    s1 = engines.step(batch=batch)  # nothing pending yet
    assert "m.loss" not in s1 and s1["global_step"] == 1
    s2 = engines.step(batch=batch)  # step 1's stats, fetched during step 2
    assert isinstance(s2["m.loss"], float) and np.isfinite(s2["m.loss"])
    assert s2["global_step"] == 1
    s3 = engines.step(batch=batch)
    assert s3["global_step"] == 2
    assert np.isfinite(s3["m.loss"])
    # the final step's stats are still in the lag slot — flush drains them
    s4 = engines.flush_stats()
    assert s4 is not None and s4["global_step"] == 3
    assert np.isfinite(s4["m.loss"])
    assert engines.flush_stats() is None  # slot drained


def test_checkpoint_restore_across_mesh_reshape(tmp_path):
    """Multi-host resume with a changed topology (round-2 VERDICT weak #7):
    save under dp=8 x tp=1, restore under dp=4 x tp=2 (and the reverse) —
    params, optimizer state, and step must come back identical, and the
    restored engine must step.  Orbax restores into the *target's*
    shardings, so the checkpoint format is mesh-shape-agnostic."""

    def host(tree):
        return jax.tree.map(lambda x: np.asarray(x), tree)

    def assert_tree_equal(a, b):
        jax.tree.map(
            lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                       np.asarray(y)),
            a, b,
        )

    _, params, loss_fn, batch4 = make_tiny()
    batch = {k: np.concatenate([v, v], axis=0) for k, v in batch4.items()}
    src = Engine("model", params, loss_fn, OPT_CFG, tmp_path / "a",
                 mesh=build_mesh(8, 1))
    for i in range(2):
        src.train_batch(batch, jax.random.PRNGKey(i))
    src.save_checkpoint()
    want_params, want_opt = host(src.params), host(src.opt_state)

    # fresh engine, different mesh shape, same checkpoint root
    dst = Engine("model", params, loss_fn, OPT_CFG, tmp_path / "a",
                 mesh=build_mesh(4, 2))
    assert dst.load_checkpoint()
    assert dst.step == 2
    assert_tree_equal(host(dst.params), want_params)
    assert_tree_equal(host(dst.opt_state), want_opt)
    # the restored state is live on the new mesh: one more step works and
    # matches the same step taken on the original mesh
    s_new = dst.train_batch(batch, jax.random.PRNGKey(7))
    s_old = src.train_batch(batch, jax.random.PRNGKey(7))
    assert s_new["model.loss"] == pytest.approx(s_old["model.loss"], rel=1e-5)

    # reverse direction: 4x2 -> 8x1
    dst.save_checkpoint()
    back = Engine("model", params, loss_fn, OPT_CFG, tmp_path / "a",
                  mesh=build_mesh(8, 1))
    assert back.load_checkpoint()
    assert back.step == 3
    assert_tree_equal(host(back.params), host(dst.params))

    # zero1 across a mesh reshape: the dp-sharded moment layout differs
    # per topology, so the restore must re-shard onto the new mesh's
    # zero1 shardings — and keep training
    z_src = Engine("model", params, loss_fn, OPT_CFG, tmp_path / "z",
                   mesh=build_mesh(8, 1), zero1=True, ema_decay=0.9)
    for i in range(2):
        z_src.train_batch(batch, jax.random.PRNGKey(i))
    z_src.save_checkpoint()
    z_dst = Engine("model", params, loss_fn, OPT_CFG, tmp_path / "z",
                   mesh=build_mesh(4, 2), zero1=True, ema_decay=0.9)
    assert z_dst.load_checkpoint()
    assert z_dst.step == 2
    assert_tree_equal(host(z_dst.params), host(z_src.params))
    assert_tree_equal(host(z_dst.ema_params), host(z_src.ema_params))
    assert_tree_equal(host(z_dst.opt_state), host(z_src.opt_state))
    sharded = sum(
        1 for leaf in jax.tree.leaves(z_dst.opt_state)
        if getattr(leaf, "ndim", 0) >= 1 and "dp" in str(leaf.sharding.spec)
    )
    assert sharded > 0  # restored onto the new mesh's zero1 layout
    s1 = z_dst.train_batch(batch, jax.random.PRNGKey(9))
    s0 = z_src.train_batch(batch, jax.random.PRNGKey(9))
    assert s1["model.loss"] == pytest.approx(s0["model.loss"], rel=1e-5)


def test_resume_skips_incomplete_checkpoint(tmp_path):
    """A SIGKILL mid-save leaves an *.orbax-checkpoint-tmp directory;
    resume must clean it and restore the newest COMPLETE checkpoint
    instead of crash-looping (found by scripts/soak.sh on-chip: orbax
    raises 'Found incomplete checkpoint' if the tmp dir is picked)."""
    _, params, loss_fn, batch = make_tiny()
    eng = Engine("model", params, loss_fn, OPT_CFG, tmp_path,
                 mesh=build_mesh(1, 1, jax.devices()[:1]))
    eng.train_batch(batch, jax.random.PRNGKey(0))
    eng.save_checkpoint()

    # fabricate the aftermath of a kill during the step-2 save
    stale = tmp_path / "model" / "step_00000002.orbax-checkpoint-tmp"
    stale.mkdir()
    (stale / "partial").write_text("killed mid-write")

    eng2 = Engine("model", params, loss_fn, OPT_CFG, tmp_path,
                  mesh=build_mesh(1, 1, jax.devices()[:1]))
    assert eng2.load_checkpoint()
    assert eng2.step == 1          # the complete step-1 checkpoint
    assert not stale.exists()      # stale tmp removed
    # retention with a tmp present never counts it as a kept checkpoint
    eng2.train_batch(batch, jax.random.PRNGKey(1))
    eng2.save_checkpoint(keep=1)
    names = sorted(p.name for p in (tmp_path / "model").iterdir())
    assert names == ["step_00000002"]
