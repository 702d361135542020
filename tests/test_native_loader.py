"""Native C++ data-loader tests: builds the shared library, verifies the npy
parser against numpy, and checks that served batches have the same contract
as the Python loader (shapes, masks, speaker-consistent prompts)."""

import numpy as np
import pytest

from tts_with_diffusion_model_tpu.config import make_spkr_getter
from tts_with_diffusion_model_tpu.data.dataset import (
    BucketSpec,
    VALLEDataset,
    load_train_val_paths,
)

PHONES = ["AA", "B", "IY", "K", "S", "T", "_"]


@pytest.fixture(scope="module")
def lib():
    from tts_with_diffusion_model_tpu.data.native_loader import load_library

    return load_library()


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_data")
    rng = np.random.default_rng(0)
    for spkr in ["sa", "sb", "sc"]:
        d = root / spkr
        d.mkdir()
        for i in range(5):
            t = int(rng.integers(25, 60))
            np.save(d / f"u{i}.qnt.npy",
                    rng.integers(0, 1024, size=(8, t)).astype(np.int16))
            phones = rng.choice(PHONES, size=int(rng.integers(12, 28)))
            (d / f"u{i}.phn.txt").write_text(" ".join(phones))
    return root


def test_native_npy_parser_matches_numpy(lib, data_dir, tmp_path):
    from tts_with_diffusion_model_tpu.data.native_loader import native_load_npy

    for dtype in (np.int16, np.int32, np.int64):
        arr = np.arange(24, dtype=dtype).reshape(3, 8)
        p = tmp_path / f"{np.dtype(dtype).name}.npy"
        np.save(p, arr)
        got = native_load_npy(p)
        np.testing.assert_array_equal(got, arr.astype(np.int32))


def test_native_batches_contract(lib, data_dir):
    from tts_with_diffusion_model_tpu.data.native_loader import NativeDataLoader

    get_spkr = make_spkr_getter("parts:-2")
    paths, _ = load_train_val_paths([data_dir], get_spkr)
    ds = VALLEDataset(paths, get_spkr, min_phones=3, max_phones=100,
                      training=True)
    bucket = BucketSpec(32, 96, 64)
    dl = NativeDataLoader(ds, batch_size=4, bucket=bucket, n_workers=2, seed=7)

    it = iter(dl)
    seen_spkrs = set()
    for _ in range(6):
        b = next(it)
        assert b["text"].shape == (4, 32)
        assert b["proms"].shape == (4, 96, 8)
        assert b["resps"].shape == (4, 64, 8)
        # masks mark contiguous prefixes
        for i in range(4):
            n = int(b["resp_mask"][i].sum())
            assert (b["resp_mask"][i, :n] == 1).all()
            assert (b["resp_mask"][i, n:] == 0).all()
            nt = int(b["text_mask"][i].sum())
            assert nt >= 3
            assert (b["text"][i, :nt] > 0).all()
            # prompts present (same-speaker utterances exist)
            assert b["prom_mask"][i].sum() > 0
        seen_spkrs.update(b["spkr_name"])
        np.testing.assert_array_equal(b["resp"], b["resps"][..., 0])
    # balanced sampling should hit every speaker across 24 draws
    assert seen_spkrs == {"sa", "sb", "sc"}
    dl.close()


def test_native_loader_prompt_values_are_real_codes(lib, data_dir):
    """Prompt content must come from actual quant files (value range check +
    mask-consistent layout)."""
    from tts_with_diffusion_model_tpu.data.native_loader import NativeDataLoader

    get_spkr = make_spkr_getter("parts:-2")
    paths, _ = load_train_val_paths([data_dir], get_spkr)
    ds = VALLEDataset(paths, get_spkr, min_phones=3, max_phones=100,
                      training=True)
    dl = NativeDataLoader(ds, batch_size=2, bucket=BucketSpec(32, 600, 64),
                          n_workers=1, seed=1)
    b = next(iter(dl))
    for i in range(2):
        n = int(b["prom_mask"][i].sum())
        assert 0 < n <= 600
        assert (b["proms"][i, :n] >= 0).all() and (b["proms"][i, :n] < 1024).all()
        assert (b["proms"][i, n:] == 0).all()
    dl.close()
