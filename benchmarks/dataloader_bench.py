"""Data-loader throughput: native C++ worker pool vs pure-Python loader.

Builds a synthetic dataset (~200 utterances), then measures batches/sec for
both paths.  Host-side batch assembly must outpace the device step time so
the TPU never starves (the reference used 8 torch workers for the same
reason, ``vall_e/data.py:197-213``).

Usage: python benchmarks/dataloader_bench.py [--batches 50]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PHONES = ["AA", "B", "IY", "K", "S", "T", "M", "N", "OW", "EH"]


def build_dataset(root: Path, n_speakers=8, n_utts=25):
    rng = np.random.default_rng(0)
    for s in range(n_speakers):
        d = root / f"spk{s:02d}"
        d.mkdir(parents=True)
        for i in range(n_utts):
            t = int(rng.integers(200, 600))
            np.save(d / f"u{i}.qnt.npy",
                    rng.integers(0, 1024, size=(8, t)).astype(np.int16))
            ph = rng.choice(PHONES, size=int(rng.integers(12, 40)))
            (d / f"u{i}.phn.txt").write_text(" ".join(ph))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, default=50)
    parser.add_argument("--batch-size", type=int, default=32)
    args = parser.parse_args()

    from tts_with_diffusion_model_tpu.config import make_spkr_getter
    from tts_with_diffusion_model_tpu.data.dataset import (
        BucketSpec,
        DataLoader,
        VALLEDataset,
        load_train_val_paths,
    )
    from tts_with_diffusion_model_tpu.data.native_loader import NativeDataLoader

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        build_dataset(root)
        get_spkr = make_spkr_getter("parts:-2")
        paths, _ = load_train_val_paths([root], get_spkr)
        ds = VALLEDataset(paths, get_spkr, min_phones=3, max_phones=100,
                          training=True)
        bucket = BucketSpec(50, 398, 448)

        def run(loader, label):
            it = iter(loader)
            next(it)  # warm
            t0 = time.perf_counter()
            for _ in range(args.batches):
                next(it)
            dt = time.perf_counter() - t0
            bps = args.batches / dt
            print(json.dumps({
                "metric": f"dataloader_{label}_batches_per_sec",
                "value": round(bps, 2),
                "unit": f"batches/s (B={args.batch_size}, bucket 50/398/448)",
            }))
            return bps

        py = run(DataLoader(ds, args.batch_size, bucket, training=True), "python")
        native = run(
            NativeDataLoader(ds, args.batch_size, bucket, n_workers=2, seed=0),
            "native",
        )
        print(json.dumps({
            "metric": "dataloader_native_speedup",
            "value": round(native / py, 2),
            "unit": "x",
        }))


if __name__ == "__main__":
    main()
