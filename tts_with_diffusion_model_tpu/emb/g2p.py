"""G2P preprocessor CLI (≡ ``vall_e/emb/g2p.py:31-50``).

``python -m tts_with_diffusion_model_tpu.emb.g2p <folder>`` reads every
``*.normalized.txt`` and writes space-joined phonemes to ``<stem>.phn.txt``.
"""

from __future__ import annotations

import argparse
import random
from pathlib import Path

from ..text.g2p import encode  # noqa: F401 (re-export: emb.g2p.encode)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("folder", type=Path)
    parser.add_argument("--suffix", type=str, default=".normalized.txt")
    args = parser.parse_args()

    paths = list(args.folder.rglob(f"*{args.suffix}"))
    random.shuffle(paths)

    for path in paths:
        phone_path = path.with_name(path.stem.split(".")[0] + ".phn.txt")
        if phone_path.exists():
            continue
        graphs = path.read_text(encoding="utf8")
        phones = encode(graphs)
        phone_path.write_text(" ".join(phones))
        print(phone_path)


if __name__ == "__main__":
    main()
    # final statement: dodge the axon-tunnel teardown wedge
    # (utils/helpers.hard_exit_if_tunnel docstring); no-op off-tunnel
    from tts_with_diffusion_model_tpu.utils.helpers import (  # noqa: E402
        hard_exit_if_tunnel,
    )

    hard_exit_if_tunnel()
