"""ctypes bindings for the native C++ data-loader (``native/dataloader.cc``).

The framework-native replacement for the reference's 8-worker torch
DataLoader (``vall_e/data.py:197-213``): npy parsing, speaker-balanced
sampling, prompt concatenation, and padded batch assembly run in C++ worker
threads off the GIL, with a bounded prefetch queue.  Falls back to the pure
Python ``DataLoader`` when the shared library can't be built (the public
semantics are identical; see tests/test_native_loader.py).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

from .dataset import BucketSpec, VALLEDataset, get_phones

_logger = logging.getLogger(__name__)

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "dataloader.cc"
_LIB = _REPO_ROOT / "native" / "libdataloader.so"

_lib = None


def build_library(force: bool = False) -> Path:
    """Compile the shared library (g++ -O3) if missing or stale."""
    if _LIB.exists() and not force:
        if _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return _LIB
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        str(_SRC), "-o", str(_LIB),
    ]
    _logger.info("Building native dataloader: %s", " ".join(cmd))
    subprocess.check_call(cmd)
    return _LIB


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(build_library()))
    lib.dl_create.restype = ctypes.c_void_p
    lib.dl_create.argtypes = [ctypes.c_int64] * 6 + [
        ctypes.c_double, ctypes.c_uint64, ctypes.c_int64,
    ]
    lib.dl_add_utterance.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int32,
    ]
    lib.dl_start.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.dl_next.restype = ctypes.c_int
    lib.dl_next.argtypes = [ctypes.c_void_p, i32, f32, i32, f32, i32, f32, i64]
    lib.dl_destroy.argtypes = [ctypes.c_void_p]
    lib.dl_load_npy.restype = ctypes.c_int
    lib.dl_load_npy.argtypes = [
        ctypes.c_char_p, i32, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ]
    _lib = lib
    return lib


def native_load_npy(path: str | Path) -> np.ndarray:
    """Read a 2-D int npy through the C++ parser (test/verification hook)."""
    lib = load_library()
    cap = 64 * 1024 * 1024
    out = np.empty(cap, np.int32)
    rows = np.zeros(1, np.int64)
    cols = np.zeros(1, np.int64)
    rc = lib.dl_load_npy(str(path).encode(), out, cap, rows, cols)
    if rc != 0:
        raise IOError(f"native npy load failed ({rc}) for {path}")
    return out[: rows[0] * cols[0]].reshape(rows[0], cols[0]).copy()


class NativeDataLoader:
    """Infinite training loader backed by the C++ worker pool.

    Only ``.qnt.npy`` artifacts are served natively; datasets containing
    ``.qnt.pt`` files should fall back to the Python loader.
    """

    def __init__(
        self,
        dataset: VALLEDataset,
        batch_size: int,
        bucket: BucketSpec,
        n_workers: int = 2,
        seed: int = 0,
        queue_cap: int = 4,
    ):
        self.batch_size = batch_size
        self.bucket = bucket
        self.dataset = dataset
        lib = load_library()
        self._lib = lib
        self._handle = ctypes.c_void_p(
            lib.dl_create(
                batch_size, bucket.text_len, bucket.prom_len, bucket.resp_len,
                bucket.n_levels, dataset.max_prompts,
                dataset.p_additional_prompt, seed, queue_cap,
            )
        )
        self.paths = list(dataset.paths)
        for path in self.paths:
            npy = (path.parent / path.name.split(".")[0]).with_suffix(".qnt.npy")
            if not npy.exists():
                raise FileNotFoundError(
                    f"NativeDataLoader requires .qnt.npy artifacts; missing {npy}"
                )
            phones = np.array(
                [dataset.phone_symmap[p] for p in get_phones(path)], np.int32
            )
            spkr = dataset.spkr_symmap[dataset.get_spkr(path)]
            lib.dl_add_utterance(
                self._handle, str(npy).encode(), phones, len(phones), spkr
            )
        lib.dl_start(self._handle, n_workers)

    def __iter__(self):
        b, bk = self.batch_size, self.bucket
        while True:
            text = np.empty((b, bk.text_len), np.int32)
            text_mask = np.empty((b, bk.text_len), np.float32)
            proms = np.empty((b, bk.prom_len, bk.n_levels), np.int32)
            prom_mask = np.empty((b, bk.prom_len), np.float32)
            resps = np.empty((b, bk.resp_len, bk.n_levels), np.int32)
            resp_mask = np.empty((b, bk.resp_len), np.float32)
            indices = np.empty((b,), np.int64)
            rc = self._lib.dl_next(
                self._handle, text.ravel(), text_mask.ravel(), proms.ravel(),
                prom_mask.ravel(), resps.ravel(), resp_mask.ravel(), indices,
            )
            if rc != 0:
                return
            yield dict(
                path=[self.paths[i] for i in indices],
                spkr_name=[self.dataset.get_spkr(self.paths[i]) for i in indices],
                text=text,
                text_mask=text_mask,
                proms=proms,
                prom_mask=prom_mask,
                resps=resps,
                resp=resps[..., 0].copy(),
                resp_mask=resp_mask,
            )

    def close(self):
        if self._handle:
            self._lib.dl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
