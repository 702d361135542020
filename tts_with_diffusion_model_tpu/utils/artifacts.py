"""Iteration-gated artifact saving (≡ ``vall_e/utils/artifacts.py``).

``is_saving()`` is true on the local leader every ``save_artifacts_every``
steps; artifacts land under ``log_dir/artifacts/<name>/<iter:06d>.<ext>``
(``artifacts.py:12-41``): figures, wavs, and t-SNE embedding plots
(scikit-learn replaces openTSNE; both implement the same algorithm)."""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from .distributed import is_local_leader

_logger = logging.getLogger(__name__)


def _trainer():
    from ..train import trainer

    return trainer


def is_saving(every: int | None = None) -> bool:
    t = _trainer()
    step = t.get_global_step()
    if step is None or not is_local_leader():
        return False
    if every is None:
        try:
            every = t.get_cfg().save_artifacts_every
        except RuntimeError:
            return False
    return bool(every) and step % every == 0


def get_path(name: str, suffix: str) -> Path:
    t = _trainer()
    cfg = t.get_cfg()
    step = t.get_global_step() or 0
    path = Path(cfg.log_dir) / "artifacts" / name / f"{step:06d}{suffix}"
    path.parent.mkdir(parents=True, exist_ok=True)
    return path


def save_fig(name: str, fig) -> Path | None:
    if not is_saving():
        return None
    path = get_path(name, ".png")
    fig.savefig(path, dpi=150)
    _logger.info(f"Saved artifact {path}")
    return path


def save_wav(name: str, wav: np.ndarray, sr: int = 24_000) -> Path | None:
    if not is_saving():
        return None
    from ..audio.wavio import write_wav

    path = get_path(name, ".wav")
    write_wav(path, wav, sr)
    _logger.info(f"Saved artifact {path}")
    return path


def save_tsne(name: str, x: np.ndarray, labels=None, perplexity: float = 30.0):
    """t-SNE scatter of embedding rows, colored by label
    (≡ ``artifacts.py:44-103``)."""
    if not is_saving():
        return None
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    try:
        from sklearn.manifold import TSNE

        emb = TSNE(
            n_components=2, perplexity=min(perplexity, max(2, len(x) / 4))
        ).fit_transform(np.asarray(x, np.float32))
    except Exception as e:  # sklearn unavailable → PCA fallback
        _logger.warning(f"t-SNE unavailable ({e}); falling back to PCA")
        xc = np.asarray(x, np.float64)
        xc = xc - xc.mean(0)
        _, _, vt = np.linalg.svd(xc, full_matrices=False)
        emb = xc @ vt[:2].T

    fig, ax = plt.subplots(figsize=(6, 6))
    if labels is not None:
        uniq = sorted(set(labels))
        for u in uniq:
            m = np.array([l == u for l in labels])
            ax.scatter(emb[m, 0], emb[m, 1], s=8, label=str(u))
        if len(uniq) <= 20:
            ax.legend(fontsize=6)
    else:
        ax.scatter(emb[:, 0], emb[:, 1], s=8)
    path = get_path(name, ".png")
    fig.savefig(path, dpi=150)
    plt.close(fig)
    _logger.info(f"Saved artifact {path}")
    return path
