"""Model diagnostics: per-module activation and gradient statistics.

Rebuild of the icefall-inspired ``Diagnostic`` (``vall_e/utils/diagnostic.py:19-188``):
the reference attaches forward hooks on every submodule and grad hooks on
every parameter, accumulating per-axis abs/pos/mean/rms/min/max stats plus
low-rank PCA singular values, rendered as a percentile DataFrame and saved
as CSV under ``log_dir/artifacts/diagnostic/``.

The JAX equivalent has no hooks; instead:
  - activations come from ``flax``'s intermediates capture
    (``capture_intermediates=True`` on apply) — every module's output;
  - gradients come from the grad pytree the training step already computes.
Both feed the same accumulator → percentile table → CSV.
"""

from __future__ import annotations

import logging
from collections import defaultdict
from pathlib import Path

import numpy as np

_logger = logging.getLogger(__name__)

STATS = ("abs", "pos", "val", "rms", "min", "max", "cnt")
PERCENTILES = (0, 5, 25, 50, 75, 95, 100)


def tensor_stats(x: np.ndarray) -> dict[str, float]:
    """The per-tensor statistics the reference accumulates per axis
    (``diagnostic.py:35-71``), computed over the whole tensor."""
    x = np.asarray(x, np.float64).ravel()
    if x.size == 0:
        return {k: 0.0 for k in STATS}
    return {
        "abs": float(np.abs(x).mean()),
        "pos": float((x > 0).mean()),
        "val": float(x.mean()),
        "rms": float(np.sqrt((x**2).mean())),
        "min": float(x.min()),
        "max": float(x.max()),
        "cnt": float(x.size),
    }


def singular_values(x: np.ndarray, max_dim: int = 512, k: int = 8) -> np.ndarray:
    """Top-k singular values for 2D-able tensors with last dim < max_dim
    (≡ the reference's ``pca_lowrank`` usage)."""
    x = np.asarray(x, np.float64)
    if x.ndim < 2:
        return np.array([])
    mat = x.reshape(-1, x.shape[-1])
    if mat.shape[-1] >= max_dim or mat.shape[0] < 2:
        return np.array([])
    sub = mat[: min(len(mat), 4096)]
    try:
        s = np.linalg.svd(sub - sub.mean(0), compute_uv=False)
    except np.linalg.LinAlgError:
        return np.array([])
    return s[:k]


class Diagnostic:
    """Accumulate stats across steps; ``save()`` writes a percentile CSV."""

    def __init__(self, log_dir: str | Path | None = None):
        self.log_dir = Path(log_dir) if log_dir else None
        self._acc: dict[str, list[dict]] = defaultdict(list)

    # ---------------- collection ----------------

    def observe_intermediates(self, intermediates: dict, prefix: str = "fwd"):
        """Feed flax ``capture_intermediates`` output (nested dict whose
        leaves are tuples of arrays)."""
        self._walk(intermediates, prefix)

    def observe_grads(self, grads: dict, prefix: str = "grad"):
        self._walk(grads, prefix)

    def observe_params(self, params: dict, prefix: str = "param"):
        self._walk(params, prefix)

    def _walk(self, node, name):
        if isinstance(node, dict):
            for k, v in node.items():
                self._walk(v, f"{name}.{k}")
        elif isinstance(node, (tuple, list)):
            for i, v in enumerate(node):
                suffix = "" if len(node) == 1 else f".{i}"
                self._walk(v, f"{name}{suffix}")
        elif hasattr(node, "shape"):
            self._acc[name].append(tensor_stats(np.asarray(node)))

    # ---------------- reporting ----------------

    def table(self):
        """Percentile table across accumulated steps (≡ ``diagnostic.py:137-180``)."""
        import pandas as pd

        rows = []
        for name, stats_list in sorted(self._acc.items()):
            row = {"name": name, "steps": len(stats_list)}
            for stat in STATS:
                vals = np.array([s[stat] for s in stats_list])
                for p in PERCENTILES:
                    row[f"{stat}_p{p}"] = float(np.percentile(vals, p))
            rows.append(row)
        return pd.DataFrame(rows)

    def save(self, iteration: int | None = None):
        from .distributed import is_global_leader

        if not is_global_leader() or self.log_dir is None:
            return None
        out_dir = self.log_dir / "artifacts" / "diagnostic"
        out_dir.mkdir(parents=True, exist_ok=True)
        it = iteration if iteration is not None else 0
        path = out_dir / f"{it:06d}.csv"
        self.table().to_csv(path, index=False)
        _logger.info(f"Saved diagnostic {path}")
        return path

    def clear(self):
        self._acc.clear()
