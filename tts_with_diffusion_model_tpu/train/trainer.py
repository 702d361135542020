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

    events: list[tuple[str, int]] = []
    eval_fn = global_leader_only(eval_fn)

    # Pre-loop command (≡ ``trainer.py:137-144``)
    command = _non_blocking_input()
    if command in ["eval", "eval_quit"]:
        eval_fn(engines=engines)
    if command in ["quit", "eval_quit"]:
        return

    for batch in _make_infinite_epochs(train_dl):
        if engines.global_step >= cfg.max_iter:
            break

        stats = engines.step(batch=batch)
        elapsed_time = stats.get("elapsed_time", 0)
        logger(data=stats)

        command = _non_blocking_input()

        if "@" in command:
            what, when = command.split("@")
            try:
                events.append((what, int(when)))
                _logger.info(f"Event {command} registered.")
            except Exception as e:
                _logger.error(e)
            command = ""

        events = [e for e in events if e[1] >= engines.global_step]
        commands = [command] + [e[0] for e in events if e[1] == engines.global_step]

        for command in commands:
            if command in ["event show", "event"]:
                msg = "Events:\n" + "\n".join("@".join(map(str, e)) for e in events)
                _logger.info(msg)
            if command == "event clear":
                events.clear()

            if "time" in command:
                target_iter = cfg.max_iter
                if " to " in command:
                    try:
                        target_iter = int(command.split(" to ")[-1])
                    except Exception as e:
                        _logger.error(e)
                remaining = (target_iter - engines.global_step + 1) * elapsed_time
                _logger.info(f"ETA: {remaining:.0f}s ({remaining / 3600:.2f}h)")

            save_ckpt_every = cfg.save_ckpt_every or cfg.eval_every
            saving_commands = ["save"]
            if cfg.save_on_quit:
                saving_commands.append("quit")

            if engines.global_step % save_ckpt_every == 0 or command in saving_commands:
                engines.save_checkpoint()

            if engines.global_step % cfg.eval_every == 0 or command in ["eval"]:
                eval_fn(engines=engines)

            if command in ["quit"]:
                return
