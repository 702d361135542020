"""Trainer-loop command-channel tests (≡ the reference's interactive stdin
control, ``utils/trainer.py:84-97, 159-207``): quit, save, eval, and
deferred ``cmd@iteration`` events — driven through a stubbed engines object
so no device work happens."""

import pytest

from tts_with_diffusion_model_tpu.train import trainer


class FakeCfg:
    max_iter = 100
    eval_every = 1000
    save_ckpt_every = 1000
    save_on_quit = True
    save_artifacts_every = None

    def dump(self):
        pass


class FakeEngines(dict):
    def __init__(self):
        super().__init__()
        self.cfg = FakeCfg()
        self.global_step = 0
        self.saves = 0
        self.steps = 0

    def step(self, batch):
        self.steps += 1
        self.global_step += 1
        return {"loss": 1.0, "elapsed_time": 0.01, "global_step": self.global_step}

    def save_checkpoint(self):
        self.saves += 1


def run_with_commands(commands, max_iter=100, monkeypatch=None):
    eng = FakeEngines()
    eng.cfg.max_iter = max_iter
    seq = iter(commands)
    monkeypatch.setattr(
        trainer, "_non_blocking_input", lambda: next(seq, "")
    )
    evals = []

    def eval_fn(engines):
        evals.append(engines.global_step)

    trainer.train(
        engines_loader=lambda: eng,
        train_dl=iter(lambda: {"x": 1}, None),  # infinite dummy batches
        eval_fn=eval_fn,
    )
    return eng, evals


def test_quit_stops_and_saves(monkeypatch):
    eng, _ = run_with_commands(["", "", "quit"], monkeypatch=monkeypatch)
    assert eng.steps == 2  # pre-loop consumed ""; quit read after step 2
    assert eng.saves == 1  # save_on_quit


def test_save_command(monkeypatch):
    eng, _ = run_with_commands(["", "save", "quit"], monkeypatch=monkeypatch)
    assert eng.saves == 2  # explicit save + save_on_quit


def test_eval_command(monkeypatch):
    eng, evals = run_with_commands(["", "eval", "quit"], monkeypatch=monkeypatch)
    assert evals == [1]


def test_deferred_event(monkeypatch):
    # register save@3 after step 1; it must fire exactly at global step 3
    eng, _ = run_with_commands(
        ["", "save@3", "", "", "quit"], monkeypatch=monkeypatch
    )
    assert eng.saves == 2  # deferred save at step 3 + save_on_quit at quit


def test_max_iter_stops(monkeypatch):
    eng, _ = run_with_commands([""] * 50, max_iter=5, monkeypatch=monkeypatch)
    assert eng.global_step == 5


def test_pre_loop_quit(monkeypatch):
    eng, _ = run_with_commands(["quit"], monkeypatch=monkeypatch)
    assert eng.steps == 0


def test_profile_every_captures_traces(monkeypatch, tmp_path):
    """cfg.profile_every wires StepProfiler into the loop: trace dirs
    appear under log_dir/profile/step_<N> on the cadence, and an in-flight
    capture is closed on exit (no dangling jax profiler session)."""
    eng = FakeEngines()
    eng.cfg.max_iter = 5
    eng.cfg.profile_every = 2
    eng.cfg.profile_n_steps = 1
    eng.cfg.log_dir = tmp_path
    monkeypatch.setattr(trainer, "_non_blocking_input", lambda: "")
    trainer.train(
        engines_loader=lambda: eng,
        train_dl=iter(lambda: {"x": 1}, None),
        eval_fn=lambda engines: None,
    )
    captured = sorted(p.name for p in (tmp_path / "profile").iterdir())
    assert captured == ["step_2", "step_4"]
    # each capture produced actual profiler output
    for d in captured:
        assert any((tmp_path / "profile" / d).rglob("*")), d
    # a second run in the same process must be able to start a new trace
    # (close() released the profiler when the loop exited)
    import jax

    jax.profiler.start_trace(str(tmp_path / "again"))
    jax.profiler.stop_trace()


def test_periodic_checkpoint_cadence(monkeypatch):
    eng = FakeEngines()
    eng.cfg.max_iter = 7
    eng.cfg.save_ckpt_every = 3
    eng.cfg.eval_every = 1000
    monkeypatch.setattr(trainer, "_non_blocking_input", lambda: "")
    trainer.train(
        engines_loader=lambda: eng,
        train_dl=iter(lambda: {"x": 1}, None),
        eval_fn=lambda engines: None,
    )
    assert eng.saves == 2  # steps 3 and 6


def test_zero_periods_disable_triggers(monkeypatch):
    """eval_every: 0 / save_ckpt_every: 0 mean "never" — they must not
    divide by zero (found driving config/gen4-style runs with eval
    disabled); explicit stdin `eval`/`save` still work."""
    eng = FakeEngines()
    eng.cfg.max_iter = 5
    eng.cfg.save_ckpt_every = 0
    eng.cfg.eval_every = 0
    eng.cfg.save_on_quit = False
    seq = iter(["", "eval", "", "save", ""])
    monkeypatch.setattr(trainer, "_non_blocking_input", lambda: next(seq, ""))
    evals = []
    trainer.train(
        engines_loader=lambda: eng,
        train_dl=iter(lambda: {"x": 1}, None),
        eval_fn=lambda engines: evals.append(engines.global_step),
    )
    assert eng.steps == 5
    assert evals == [1]      # the stdin eval only (first line is pre-loop)
    assert eng.saves == 1    # the stdin save only
