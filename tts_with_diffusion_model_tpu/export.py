"""Export a trained model to a deployment bundle.

``python -m tts_with_diffusion_model_tpu.export <path> yaml=<cfg>``

≡ ``vall_e/export.py``: loads the engines (pulling the latest checkpoint)
and writes a frozen inference artifact.  Instead of the reference's pickled
whole-model object with symmaps stapled on (``export.py:15-20``), the bundle
is a directory of explicit artifacts (SURVEY §5.4):

    <path>/params.npz       flat parameter arrays
    <path>/phone_symmap.json, spkr_symmap.json
    <path>/model.json       model family + hyperparameters
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np

from .codec.convert import load_npz_params, save_npz_params
from .config import Config
from .data.dataset import create_datasets
from .models import get_model
from .text.symmap import save_symmap


def save_bundle(path: Path, params, model_meta: dict, phone_symmap, spkr_symmap):
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    # ``params`` is the full flax variable dict ({"params": {...}}) — saved
    # as-is so load_bundle returns something apply() accepts directly.
    save_npz_params(np_params(params), path / "params.npz")
    (path / "model.json").write_text(json.dumps(model_meta, indent=1))
    save_symmap(phone_symmap, path / "phone_symmap.json")
    save_symmap(spkr_symmap, path / "spkr_symmap.json")


def np_params(tree):
    from flax import linen as nn

    tree = nn.meta.unbox(tree)  # strip LogicallyPartitioned metadata

    def rec(node):
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return np.asarray(node)

    return rec(tree)


def load_bundle(path: Path) -> tuple[dict, dict, dict, dict]:
    """Returns (params, model_meta, phone_symmap, spkr_symmap)."""
    from .text.symmap import load_symmap

    import jax.numpy as jnp

    path = Path(path)
    params = load_npz_params(path / "params.npz")
    # device arrays, not numpy: jitted samplers fancy-index embedding tables
    # with traced token ids.  f16 bundles (--dtype f16, a storage-size
    # optimization) are upcast back to fp32 here so every consumer sees the
    # usual dtype; serving still casts to bf16 (utils/precision.py).
    params = jax.tree.map(
        lambda a: jnp.asarray(
            a, jnp.float32 if np.asarray(a).dtype == np.float16 else None
        ),
        params,
    )
    meta = json.loads((path / "model.json").read_text())
    return (
        params,
        meta,
        load_symmap(path / "phone_symmap.json"),
        load_symmap(path / "spkr_symmap.json"),
    )


def main():
    # from_cli first: it strips key=value args so argparse sees only the path
    # (same contract as the reference's import-time cfg, SURVEY §5.6).
    cfg = Config.from_cli()

    parser = argparse.ArgumentParser("Save trained model to path.")
    parser.add_argument("path", type=Path)
    parser.add_argument(
        "--ema", action="store_true",
        help="export the EMA-averaged weights (requires training with "
             "ema_decay set; typically better sample quality)",
    )
    parser.add_argument(
        "--dtype", choices=("f32", "f16"), default="f32",
        help="storage dtype for params.npz: f16 halves the bundle size; "
             "serving casts to bf16 either way (utils/precision.py), so "
             "f16 storage only rounds the fp32 master weights once more",
    )
    args = parser.parse_args()
    from .train.train import load_engines

    engines = load_engines(cfg)
    engine = engines["model"]

    params = engine.params
    if args.ema:
        if engine.ema_params is None:
            raise SystemExit(
                "--ema requires a run trained with ema_decay set "
                "(the checkpoint carries no averaged weights)"
            )
        params = engine.ema_params

    if args.dtype == "f16":
        import jax.numpy as jnp

        params = jax.tree.map(
            lambda a: (jnp.asarray(a, jnp.float16)
                       if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                       else a),
            params,
        )

    train_dataset, _ = create_datasets(cfg)
    meta = {
        "model": cfg.model,
        "num_tokens": cfg.num_tokens,
        "step": engine.global_step,
        "cfg_name": cfg.cfg_name,
        "weights": "ema" if args.ema else "raw",
        # carry any architecture overrides so the CLI rebuilds the exact
        # trained architecture (see __main__.build_model)
        **(cfg.model_overrides or {}),
    }
    save_bundle(
        args.path,
        params,
        meta,
        train_dataset.phone_symmap,
        train_dataset.spkr_symmap,
    )
    print(args.path, "saved.")


if __name__ == "__main__":
    main()
    # final statement: dodge the axon-tunnel teardown wedge
    # (utils/helpers.hard_exit_if_tunnel docstring); no-op off-tunnel
    from tts_with_diffusion_model_tpu.utils.helpers import (  # noqa: E402
        hard_exit_if_tunnel,
    )

    hard_exit_if_tunnel()
