"""Profiling/tracing hooks (SURVEY §5.1).

The reference's per-step timing uses explicit cuda synchronize
(``vall_e/utils/engines.py:127-151``); the TPU equivalents here are:
  - wall-clock step timing with ``block_until_ready`` (built into
    ``Engines.step``);
  - ``jax.profiler`` trace capture: ``trace(log_dir)`` context manager and
    ``annotate(name)`` for named regions visible in Perfetto/TensorBoard;
  - ``profile_steps``: capture a trace for N training steps on a cadence.
"""

from __future__ import annotations

import contextlib
import logging
from pathlib import Path

import jax

_logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a device trace into ``log_dir`` (viewable in XProf/Perfetto)."""
    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        _logger.info(f"Wrote profiler trace to {log_dir}")


def annotate(name: str):
    """Named trace region: ``with annotate('train_step'): ...``."""
    return jax.profiler.TraceAnnotation(name)


class StepProfiler:
    """Capture a trace for ``n_steps`` every ``every`` steps (opt-in).

    Usage in a training loop::

        prof = StepProfiler(log_dir, every=1000, n_steps=3)
        for batch in dl:
            prof.maybe_start(step)
            ...
            prof.maybe_stop(step)
    """

    def __init__(self, log_dir: str | Path, every: int = 0, n_steps: int = 3):
        self.log_dir = Path(log_dir) / "profile"
        self.every = every
        self.n_steps = n_steps
        self._active_until: int | None = None

    def maybe_start(self, step: int):
        if self.every and step % self.every == 0 and self._active_until is None:
            jax.profiler.start_trace(str(self.log_dir / f"step_{step}"))
            self._active_until = step + self.n_steps

    def maybe_stop(self, step: int):
        if self._active_until is not None and step + 1 >= self._active_until:
            jax.profiler.stop_trace()
            self._active_until = None

    def close(self):
        """Finish any in-flight capture (loop exited mid-window)."""
        if self._active_until is not None:
            jax.profiler.stop_trace()
            self._active_until = None
