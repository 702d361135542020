"""Generic training loop (≡ ``vall_e/utils/trainer.py:118-210``).

Preserves the reference's operational surface:
  - infinite epochs over the train loader, JSON-line stats logging;
  - **interactive stdin control** read on the global leader and broadcast to
    all hosts (``:84-97``): ``eval``, ``save``, ``quit``, ``eval_quit``,
    deferred ``cmd@iteration`` events, and ``time [to N]`` ETA;
  - periodic checkpointing every ``save_ckpt_every or eval_every`` and
    periodic eval; ``save_on_quit`` honored;
  - module globals ``get_global_step()`` / ``get_cfg()`` for artifact savers.
"""

from __future__ import annotations

import json
import logging
import selectors
import sys
from functools import cache
from typing import Callable, Protocol

from ..utils.distributed import (
    broadcast_object,
    global_leader_only,
    is_global_leader,
    is_local_leader,
    local_leader_only,
)
from .engine import Engine, Engines  # noqa: F401  (re-export, ≡ trainer.Engine)

_logger = logging.getLogger(__name__)
_engines: Engines | None = None
_command: str = ""


def get_global_step():
    try:
        return _engines.global_step
    except Exception:
        return None


def get_cfg():
    if _engines is None:
        raise RuntimeError("Trainer has not been setup. Have you called trainer.train?")
    return _engines.cfg


def get_cmd():
    return _command


get_iteration = get_global_step


def load_engines(engines: dict[str, Engine], config) -> Engines:
    out = Engines(engines)
    out.setup(config)
    out.load_checkpoint()
    return out


@cache
def _get_stdin_selector():
    selector = selectors.DefaultSelector()
    selector.register(fileobj=sys.stdin, events=selectors.EVENT_READ)
    return selector


def _non_blocking_input() -> str:
    global _command
    s = ""
    if is_global_leader():
        try:
            selector = _get_stdin_selector()
            for key, _ in selector.select(timeout=0):
                s = key.fileobj.readline().strip()
                _logger.info(f'Get stdin "{s}".')
        except Exception:
            s = ""
    _command = str(broadcast_object(s))
    return _command


def _make_infinite_epochs(dl):
    while True:
        _logger.info("New epoch starts.")
        yield from dl


@local_leader_only(default=None)
def logger(data):
    return _logger.info(json.dumps(data, default=str))


class _DeferredCommands:
    """Commands scheduled for a future step via the ``<cmd>@<step>`` syntax.

    The operator types e.g. ``save@5000`` into the training process's stdin;
    the ``save`` fires when ``global_step`` reaches 5000.  Entries whose step
    has already passed are dropped silently.
    """

    def __init__(self):
        self._queue: list[tuple[int, str]] = []

    def maybe_defer(self, raw: str) -> bool:
        """If ``raw`` looks like ``cmd@step``, enqueue it and return True."""
        if "@" not in raw:
            return False
        cmd, _, step_str = raw.partition("@")
        try:
            self._queue.append((int(step_str), cmd))
            _logger.info("deferred %r until step %s", cmd, step_str)
        except ValueError as e:
            _logger.error("could not parse deferred command %r: %s", raw, e)
        return True

    def take_due(self, step: int) -> list[str]:
        """Pop and return commands due at ``step``; discard stale ones."""
        due = [cmd for when, cmd in self._queue if when == step]
        self._queue = [(when, cmd) for when, cmd in self._queue if when > step]
        return due

    def describe(self) -> str:
        return ", ".join(f"{cmd}@{when}" for when, cmd in self._queue) or "(none)"

    def clear(self) -> None:
        self._queue.clear()


class EvalFn(Protocol):
    def __call__(self, *, engines: Engines):
        ...


def train(
    engines_loader: Callable[[], Engines],
    train_dl,
    eval_fn: EvalFn,
    logger: Callable = logger,
):
    """The loop.  Note: unlike the reference there is no ``train_feeder``
    argument — each engine's loss function is compiled into its jitted step
    (see ``train/train.py`` for where the per-model feeders are bound)."""
    engines = engines_loader()
    cfg = engines.cfg

    if is_local_leader():
        cfg.dump()
        _logger.info(cfg)

    global _engines
    _engines = engines

    eval_fn = global_leader_only(eval_fn)
    schedule = _DeferredCommands()
    ckpt_period = cfg.save_ckpt_every or cfg.eval_every
    step_seconds = 0.0

    # Periodic device-trace capture (cfg.profile_every, SURVEY §5.1) —
    # leader-only, like the reference's opt-in Diagnostic.
    prof = None
    if getattr(cfg, "profile_every", None) and is_global_leader():
        from ..utils.profiling import StepProfiler

        prof = StepProfiler(
            cfg.log_dir,
            every=cfg.profile_every,
            n_steps=getattr(cfg, "profile_n_steps", 3),
        )

    def report_eta(spec: str) -> None:
        # "time" → ETA to max_iter; "time to N" → ETA to step N.
        horizon = cfg.max_iter
        tail = spec.partition(" to ")[2]
        if tail:
            try:
                horizon = int(tail)
            except ValueError:
                _logger.error("bad step in %r — expected 'time to <int>'", spec)
        secs = max(0, horizon - engines.global_step + 1) * step_seconds
        _logger.info("eta %.0fs (%.2fh) to step %d", secs, secs / 3600, horizon)

    # A command typed before the first step can eval and/or exit immediately.
    startup = _non_blocking_input()
    if startup in ("eval", "eval_quit"):
        eval_fn(engines=engines)
    if startup in ("quit", "eval_quit"):
        return

    def flush_async_stats():
        # cfg.async_stats lags stats one step; the final step's line is
        # still in the slot when the loop exits (Engines.flush_stats).
        final = getattr(engines, "flush_stats", lambda: None)()
        if final:
            logger(data=final)
        if prof is not None:
            prof.close()

    for batch in _make_infinite_epochs(train_dl):
        if engines.global_step >= cfg.max_iter:
            break

        if prof is not None:
            prof.maybe_start(engines.global_step + 1)
        stats = engines.step(batch=batch)
        if prof is not None:
            prof.maybe_stop(engines.global_step)
        step_seconds = stats.get("elapsed_time", 0)
        logger(data=stats)

        step = engines.global_step
        typed = _non_blocking_input()
        if schedule.maybe_defer(typed):
            typed = ""

        # Actions are collected as flags so that a periodic trigger and an
        # explicit command on the same step produce one save/eval, not two.
        # 0 disables the periodic trigger (stdin `save`/`eval` still work)
        want_save = bool(ckpt_period) and step % ckpt_period == 0
        want_eval = bool(cfg.eval_every) and step % cfg.eval_every == 0
        want_quit = False

        for cmd in (typed, *schedule.take_due(step)):
            if cmd in ("event", "event show"):
                _logger.info("deferred commands: %s", schedule.describe())
            elif cmd == "event clear":
                schedule.clear()
            elif cmd.startswith("time"):
                report_eta(cmd)
            elif cmd == "save":
                want_save = True
            elif cmd == "eval":
                want_eval = True
            elif cmd == "quit":
                want_quit = True
                want_save = want_save or cfg.save_on_quit

        if want_save:
            engines.save_checkpoint()
        if want_eval:
            eval_fn(engines=engines)
        if want_quit:
            flush_async_stats()
            return
    flush_async_stats()
