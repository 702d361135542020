"""Serving runtime: preloaded, shape-stable, warm-compiled TTS synthesis.

The reference has no serving story (its CLI reloads pickled models per
invocation, ``__main__.py:53-54``).  For production deployment this module
provides:

  - ``Synthesizer``: bundles loaded once, bf16 serving precision, every
    request padded to **fixed buckets** so all device programs are compiled
    exactly once (``warmup()`` pre-compiles them);
  - **micro-batching** (``max_batch > 1``): concurrent requests are coalesced
    into one fixed-size device batch (padded with dummy rows) within a small
    window — measured on-chip, B=8 yields ~1.6× the tokens/sec/chip of
    sequential B=1 generations (PARITY.md), so a loaded server trades a few
    ms of queueing for real throughput;
  - a stdlib-only threaded HTTP API:
        GET  /healthz                         → {"status": "ok"}
        GET  /stats                           → serving counters + latency
             percentiles (p50/p90/p99 ms over a sliding window), batch
             occupancy, error count, uptime
        POST /tts  {"text": ..., "reference": <wav path>, "seed": 0}
                                               → audio/wav bytes
        POST /tts_stream  (same body)          → chunked audio/L16 PCM,
             one chunk per long-form segment (first audio after one
             segment's latency instead of the whole request's)
    ``python -m tts_with_diffusion_model_tpu.serve --ar-ckpt zoo/ar
    --nar-ckpt zoo/nar --port 8400 [--max-batch 8 --batch-window-ms 10]``

Request handling is serialized around the single accelerator (the HTTP
layer is threaded for I/O; device work goes through the batcher / a lock).
Sampling note: every request's sampling noise derives only from its *own*
seed (per-row PRNG keys, ``utils/rng.py``), so the same (text, reference,
seed) returns bit-identical audio whether the request runs alone or inside
any micro-batch cohort.
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import queue
import threading
import time
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_logger = logging.getLogger(__name__)


class Synthesizer:
    """text + reference wav → wav, with compile-once fixed buckets."""

    #: diffusion generation sub-batch size: the largest batch whose 99-step
    #: scan working set stays VMEM-resident on a v5e (measured crossover —
    #: see docs/serving.md capacity table); bigger device batches run as
    #: sequential chunks of this size inside one compiled program.
    GEN_CHUNK = 8

    def __init__(
        self,
        ar_ckpt: str | Path,
        nar_ckpt: str | Path,
        text_len: int = 50,
        prom_len: int = 398,
        gen_len: int = 350,
        max_ar_steps: int = 448,
        temperature: float = 1.0,
        nar_temperature: float = 0.2,
        bf16: bool = True,
        max_batch: int = 1,
        stride: int = 1,
        mesh_tp: int = 1,
        # maskgit is the measured serving default: better held-out
        # full-stack accuracy AND lower p50 than the ancestral chain
        # (round-4 evidence, heldout_fullstack_v2_maskgit.json +
        # BENCH_r04.json; K=12 from the r3 K-sweep).  decode="ancestral"
        # selects the reference-parity sampler; None resolves to
        # ancestral when stride > 1 (stride is an ancestral-chain knob),
        # else maskgit.
        decode: str | None = None,
        maskgit_steps: int = 12,
        draft_ckpt: str | Path | None = None,
        spec_k: int = 4,
    ):
        from .__main__ import build_model
        from .codec.encodec import load_codec
        from .export import load_bundle
        from .utils.precision import cast_params_bf16

        self.first_params, self.first_meta, self.phone_symmap, _ = load_bundle(ar_ckpt)
        self.nar_params, nar_meta, _, _ = load_bundle(nar_ckpt)
        self.first = build_model(self.first_meta)
        self.nar = build_model(nar_meta)
        if bf16:
            self.first_params = cast_params_bf16(self.first_params)
            self.nar_params = cast_params_bf16(self.nar_params)

        if decode is None:
            decode = "ancestral" if stride > 1 else "maskgit"
        self.decode = decode

        # Speculative decoding for AR first stages: a small draft bundle
        # proposes spec_k tokens/round, the target verifies them in one
        # forward (models/ar.py ar_generate_speculative; exact vs the
        # target's greedy decode at temperature 0).
        self.draft = self.draft_params = None
        self.spec_k = max(1, int(spec_k))
        if draft_ckpt is not None:
            from .models.ar import AR as _AR

            self.draft_params, d_meta, _, _ = load_bundle(draft_ckpt)
            self.draft = build_model(d_meta)
            if not isinstance(self.draft, _AR) or not isinstance(
                self.first, _AR
            ):
                raise ValueError(
                    "draft_ckpt requires AR bundles for both draft and "
                    "first stage"
                )
            if self.draft.n_tokens != self.first.n_tokens:
                raise ValueError(
                    f"draft vocab ({self.draft.n_tokens}) must match the "
                    f"target's ({self.first.n_tokens})"
                )
            if bf16:
                self.draft_params = cast_params_bf16(self.draft_params)

        # Tensor-parallel serving: shard attention heads / MLP hidden /
        # vocab over a 1×tp mesh (same logical annotations the trainer
        # resolves, parallel/mesh.py).  jit then compiles SPMD programs
        # with XLA-inserted collectives riding ICI — for models past one
        # chip's HBM or latency targets one chip can't reach.  Outputs are
        # identical to single-device serving (tested on the virtual CPU
        # mesh, tests/test_serve.py).  The reference is single-GPU only
        # (``__main__.py:50``).
        self.mesh = None
        if mesh_tp > 1:
            from .parallel.infer import shard_params
            from .parallel.mesh import build_mesh

            self.mesh = build_mesh(1, mesh_tp)
            self.first_params = shard_params(self.mesh, self.first_params)
            self.nar_params = shard_params(self.mesh, self.nar_params)

        self.codec = load_codec()
        self.text_len = text_len
        self.prom_len = prom_len
        self.gen_len = gen_len
        self.max_ar_steps = max_ar_steps
        self.temperature = temperature
        self.nar_temperature = nar_temperature
        self.max_batch = max(1, max_batch)
        self._lock = threading.Lock()
        from collections import OrderedDict

        self._prom_cache: OrderedDict = OrderedDict()
        self._prom_cache_lock = threading.Lock()
        self.prom_cache_hits = 0
        self.prom_cache_misses = 0

        from .models.diffusion import DiffusionModel
        from .models.gaussian_tts import GaussianDiffusionModel

        self.is_diffusion = isinstance(
            self.first, (DiffusionModel, GaussianDiffusionModel)
        )
        self._fused_synth = None
        if self.is_diffusion:
            c = self.first.config
            self.text_len, self.prom_len, self.gen_len = (
                c.text_len, c.prom_len, c.gen_len,
            )
            # stride > 1 = skip-step sampling (closed-form interval
            # posterior): ~stride× fewer denoiser steps per utterance, a
            # measured ~3× latency cut at stride=3 (PARITY.md) for a
            # quality trade the operator opts into.
            stride_v = max(1, int(stride))
            # D3PM-only knobs; the continuous Gaussian family samples its
            # full fixed schedule at the model bucket.  decode="maskgit"
            # swaps the 99-step ancestral chain for confidence-ordered
            # parallel decoding in `maskgit_steps` denoiser evaluations
            # (DiffusionModel.generate_maskgit) — the high-throughput
            # serving mode.
            gen_kw = {}
            first_fn = self.first.generate
            if isinstance(self.first, DiffusionModel):
                # Tight generation bucket: smallest 128-multiple covering
                # gen_len (384 vs the model's 448 at the reference config)
                # — bit-identical valid tokens, ~25% less self-attention
                # score work per step (model.generate docstring).
                bucket_v = c.serving_resp_bucket
                if decode == "maskgit":
                    first_fn = self.first.generate_maskgit
                    gen_kw = dict(
                        # K cannot exceed the generation window (each step
                        # must commit ≥1 token); clamp so small-gen_len
                        # bundles serve with the same default config
                        steps=max(1, min(int(maskgit_steps), c.gen_len)),
                        resp_bucket=bucket_v,
                    )
                else:
                    gen_kw = dict(stride=stride_v, resp_bucket=bucket_v)

            def first_gen(p, t, tm, pr, pm, r):
                # Device batches past GEN_CHUNK run as sequential
                # GEN_CHUNK-sized sub-batches inside one program
                # (lax.map): past B=8 the 99-step scan's per-block K/V and
                # attention working set exceeds VMEM and spills to HBM
                # every step — measured B=16 monolithic 4384 tok/s/chip vs
                # 7837 chunked (docs/serving.md).  Per-row PRNG keys make
                # chunked and monolithic outputs identical.
                B = t.shape[0]  # static under jit: one trace per bucket
                if B > self.GEN_CHUNK and B % self.GEN_CHUNK == 0:
                    n = B // self.GEN_CHUNK
                    ck = lambda a: a.reshape(n, self.GEN_CHUNK, *a.shape[1:])

                    def one(xs):
                        t_, m1, pr_, m2, r_ = xs
                        return first_fn(p, t_, m1, pr_, m2, r_, **gen_kw)

                    out = jax.lax.map(
                        one, (ck(t), ck(tm), ck(pr), ck(pm), ck(r))
                    )
                    return out.reshape(B, *out.shape[2:])
                return first_fn(p, t, tm, pr, pm, r, **gen_kw)

            self._first_gen = jax.jit(first_gen)

            # Fused one-dispatch synthesis: first stage → 7 NAR levels →
            # codec decode inside ONE compiled program.  The staged path
            # host-syncs three times per request (first-stage fetch, NAR
            # fetch, decode fetch) — at the measured ~30-40 ms dispatch
            # round-trip that dominates per-call latency once the device
            # work is tens of ms (PARITY.md).  Diffusion first stages have
            # a static generation length, so the whole chain is one static
            # program; AR stays staged (dynamic lengths).  ``want_wav`` is
            # a static switch: segment traffic (long-form/streaming) needs
            # only codes and skips the in-graph decode.
            from .codec.encodec import HOP as _HOP
            from .codec.encodec import EncodecModel as _Codec
            from .models.nar import nar_generate as _nar_generate

            gen_len_v = self.gen_len
            d_bucket = max(
                1, -(-gen_len_v // self.DECODE_BUCKET)
            ) * self.DECODE_BUCKET

            def fused_synth(fp, nparams, cparams, t, tm, pr, pm, r1, r2,
                            want_wav):
                toks = first_gen(fp, t, tm, pr, pm, r1)[:, :gen_len_v]
                B = t.shape[0]
                rm = jnp.ones((B, gen_len_v), jnp.float32)
                codes = _nar_generate(
                    self.nar, nparams, t, tm, pr, pm, toks, rm, r2,
                    sampling_temperature=self.nar_temperature,
                )  # (B, gen_len, 8)
                if not want_wav:
                    return codes, None
                padded = jnp.zeros((B, d_bucket, 8), jnp.int32)
                padded = padded.at[:, :gen_len_v].set(codes)
                wav = self.codec.model.apply(
                    cparams, jnp.transpose(padded, (0, 2, 1)),
                    method=_Codec.decode,
                )  # (B, T, 1), causal: padded tail trims exactly
                return codes, wav[:, : gen_len_v * _HOP, 0]

            self._fused_synth = jax.jit(
                fused_synth, static_argnames=("want_wav",)
            )

    # ---------------- request path ----------------

    def _pad(self, arr: np.ndarray, length: int, extra_dims=()):
        out = np.zeros((1, length, *extra_dims), np.int32)
        mask = np.zeros((1, length), np.float32)
        n = min(len(arr), length)
        out[0, :n] = arr[:n]
        mask[0, :n] = 1
        return out, mask

    #: prompt-length buckets are 128-frame multiples (TPU lane tiling);
    #: a cohort runs at the smallest bucket covering its longest prompt.
    PROM_BUCKET = 128

    def phones_and_ids(self, text: str) -> tuple[list[str], list[int]]:
        """g2p + symmap mapping, computed once per request (the phone list
        feeds long-form segmentation; the ids feed the text bucket)."""
        from .emb import g2p
        from .text.symmap import phones_to_ids

        phones = g2p.encode(text)
        ids = phones_to_ids(phones, self.phone_symmap, strict=False)
        if not ids:
            raise ValueError("no usable phones in input text")
        return phones, ids

    def phone_ids(self, text: str) -> list[int]:
        return self.phones_and_ids(text)[1]

    #: reference-wav encode cache capacity (distinct speaker prompts kept)
    PROM_CACHE_CAP = 64

    def prompt_codes(self, reference: str | Path) -> np.ndarray:
        """Reference wav → (t, 8) codec prompt codes.

        Cached per (path, mtime, size): serving traffic reuses a small set
        of speaker prompts, and re-running the codec encoder per request
        is pure waste (measured 29.3 ms/encode on-chip, PARITY.md — at
        B=1 that's ~30% of a whole synthesis).  A changed file re-encodes.
        """
        from .emb import qnt

        try:
            st = Path(reference).stat()
            key = (str(Path(reference).resolve()), st.st_mtime_ns, st.st_size)
        except OSError:
            # let encode_from_file raise its own (clearer) error
            return qnt.encode_from_file(reference).T.astype(np.int32)
        with self._prom_cache_lock:
            hit = self._prom_cache.get(key)
            if hit is not None:
                self._prom_cache.move_to_end(key)
                self.prom_cache_hits += 1
                return hit
        codes = qnt.encode_from_file(reference).T.astype(np.int32)
        with self._prom_cache_lock:
            self.prom_cache_misses += 1
            self._prom_cache[key] = codes
            self._prom_cache.move_to_end(key)
            while len(self._prom_cache) > self.PROM_CACHE_CAP:
                self._prom_cache.popitem(last=False)
        return codes

    def _prepare_ids(self, ids: list[int], proms: np.ndarray) -> dict:
        """Bucket-pad phone ids + (t, 8) prompt codes into one request row.

        ``prom_n`` records the prompt's true length so the device batch can
        run at the smallest prompt bucket covering its cohort (pads are
        masked out of attention, so tokens are identical at any bucket)."""
        text_a, text_m = self._pad(np.asarray(ids, np.int32), self.text_len)
        prom_a, prom_m = self._pad(proms, self.prom_len, (8,))
        return dict(text=text_a, text_mask=text_m, proms=prom_a,
                    prom_mask=prom_m, prom_n=min(len(proms), self.prom_len))

    def _prepare(self, text: str, reference: str | Path) -> dict:
        """Host-side request prep: g2p + codec-encode + bucket padding."""
        return self._prepare_ids(self.phone_ids(text), self.prompt_codes(reference))

    def synthesize_codes_batch(
        self, prepared: list[dict], seeds: list[int]
    ) -> list[np.ndarray]:
        """Run the device stages on up to ``max_batch`` prepared rows →
        per-request (t, 8) codec codes (no waveform decode)."""
        return self._device_batch(prepared, seeds, want_wav=False)[0]

    def _device_batch(
        self, prepared: list[dict], seeds: list[int], want_wav: bool = False
    ) -> tuple[list[np.ndarray], list[np.ndarray] | None]:
        """Device stages for a cohort → (per-request (t, 8) codes,
        per-request wav float32 or None).

        ``seeds`` carries one request seed per row; each row's sampling
        noise derives only from its own seed (per-row keys + per-stage
        fold), so outputs are cohort-independent.

        Two batch buckets keep programs compile-once without taxing idle
        servers: a lone request runs the B=1 program (a single request on a
        ``--max-batch 8`` server would otherwise pay the full B=8 compute —
        ~5× its latency at measured generation times); 2+ requests pad to
        ``max_batch`` with copies of row 0 (discarded).
        """
        from .models.ar import ar_generate
        from .models.nar import nar_generate
        from .utils.rng import fold_rows, row_keys_from_seeds

        if not 1 <= len(prepared) <= self.max_batch:
            raise ValueError(f"need 1..{self.max_batch} requests")
        if len(seeds) != len(prepared):
            raise ValueError("need one seed per prepared row")
        n_req = len(prepared)
        pad_to = 1 if n_req == 1 else self.max_batch
        rows = prepared + [prepared[0]] * (pad_to - n_req)
        row_seeds = list(seeds) + [seeds[0]] * (pad_to - n_req)

        def stack(key):
            return jnp.asarray(np.concatenate([r[key] for r in rows], axis=0))

        text_a, text_m = stack("text"), stack("text_mask")
        prom_a, prom_m = stack("proms"), stack("prom_mask")
        # Tight prompt bucket for this cohort: the speaker cross-attention
        # (the second-largest attention cost) scales with prompt length,
        # and masked pads contribute nothing — so slice, don't carry, the
        # unused prompt tail.  Compile-once still holds: at most
        # prom_len/PROM_BUCKET distinct programs per batch bucket.
        pn = max(int(r.get("prom_n", self.prom_len)) for r in rows)
        pb = min(self.prom_len,
                 max(1, -(-pn // self.PROM_BUCKET)) * self.PROM_BUCKET)
        prom_a, prom_m = prom_a[:, :pb], prom_m[:, :pb]
        row_keys = row_keys_from_seeds(row_seeds)
        r1 = fold_rows(row_keys, 0)  # first stage (AR / diffusion)
        r2 = fold_rows(row_keys, 1)  # NAR stage

        wavs = None
        with self._lock:
            if self.is_diffusion:
                # One program runs first stage + NAR levels (+ decode when
                # wav is wanted): a single host sync per cohort instead of
                # three (see the fused_synth note in __init__).
                codes_d, wav_d = self._fused_synth(
                    self.first_params, self.nar_params, self.codec.params,
                    text_a, text_m, prom_a, prom_m, r1, r2,
                    want_wav=bool(want_wav),
                )
                codes = np.asarray(codes_d)
                if wav_d is not None:
                    w = np.asarray(wav_d)
                    wavs = [w[i] for i in range(n_req)]
                return [codes[i] for i in range(n_req)], wavs
            else:
                if self.draft is not None:
                    from .models.ar import ar_generate_speculative

                    toks, lens_a = ar_generate_speculative(
                        self.first, self.first_params,
                        self.draft, self.draft_params,
                        text_a, text_m, prom_a, prom_m, r1,
                        max_steps=self.max_ar_steps, k=self.spec_k,
                        sampling_temperature=self.temperature,
                    )
                else:
                    toks, lens_a = ar_generate(
                        self.first, self.first_params, text_a, text_m,
                        prom_a, prom_m, r1, max_steps=self.max_ar_steps,
                        sampling_temperature=self.temperature,
                    )
                n_resp = self.max_ar_steps  # static bucket; mask below
                lens = [max(int(n), 1) for n in np.asarray(lens_a)]
                lvl0 = np.zeros((pad_to, n_resp), np.int32)
                toks = np.asarray(toks)
                for i, n in enumerate(lens):
                    lvl0[i, :n] = toks[i, :n]

            rm = np.zeros((pad_to, n_resp), np.float32)
            for i, n in enumerate(lens):
                rm[i, :n] = 1
            codes = nar_generate(
                self.nar, self.nar_params, text_a, text_m, prom_a, prom_m,
                jnp.asarray(lvl0), jnp.asarray(rm), r2,
                sampling_temperature=self.nar_temperature,
            )
            codes = np.asarray(codes)
        return [codes[i, : lens[i]] for i in range(n_req)], None

    #: codec-decode lengths pad up to multiples of this many frames, so the
    #: jit'd decoder compiles one program per *bucket*, not per length (the
    #: decoder is causal end-to-end, so trimming the padded tail is exact).
    DECODE_BUCKET = 448

    def decode_codes(self, codes: np.ndarray) -> tuple[np.ndarray, int]:
        """(t, 8) codes → (wav float32 (T,), sample_rate), bucket-padded."""
        from .codec.encodec import HOP

        t = len(codes)
        bucket = max(1, -(-t // self.DECODE_BUCKET)) * self.DECODE_BUCKET
        padded = np.zeros((bucket, 8), np.int32)
        padded[:t] = codes
        with self._lock:
            wav, sr = self.codec.decode(padded.T)
        return wav[..., : t * HOP], sr

    def synthesize_batch(
        self, requests: list[tuple[str, str | Path, int]]
    ) -> list[tuple[np.ndarray, int]]:
        """Synthesize up to ``max_batch`` requests in one device batch."""
        if not 1 <= len(requests) <= self.max_batch:
            raise ValueError(f"need 1..{self.max_batch} requests")
        prepared = [self._prepare(t, ref) for t, ref, _ in requests]
        codes, wavs = self._device_batch(
            prepared, [int(seed) for _, _, seed in requests], want_wav=True
        )
        if wavs is not None:  # fused path decoded in-graph
            return [(w, self.sample_rate) for w in wavs]
        return [self.decode_codes(c) for c in codes]

    def synthesize(self, text: str, reference: str | Path, seed: int = 0):
        """Returns (wav float32 (T,), sample_rate).

        Texts whose phone sequences exceed the first stage's text bucket are
        synthesized in chained segments (``longform.synthesize_long``) rather
        than silently truncated.
        """
        phones, ids = self.phones_and_ids(text)
        if len(ids) > self.text_len:
            from .longform import synthesize_long

            return synthesize_long(self, text, reference, seed=seed,
                                   phones=phones)
        row = self._prepare_ids(ids, self.prompt_codes(reference))
        codes, wavs = self._device_batch([row], [int(seed)], want_wav=True)
        if wavs is not None:  # fused path decoded in-graph
            return wavs[0], self.sample_rate
        return self.decode_codes(codes[0])

    def synthesize_stream(
        self,
        text: str,
        reference: str | Path,
        seed: int = 0,
        context_frames: int = 112,
        submit_row=None,
    ):
        """Generator yielding wav float32 chunks as segments complete.

        Time-to-first-audio for an N-segment long-form request drops from
        N× to 1× the single-utterance latency.  Each chunk is decoded with
        the previous ``context_frames`` codec frames as context and the
        contexted samples dropped — the causal decoder makes the chunk
        samples match the one-shot decode up to the (LSTM) state beyond the
        context window; ``context_frames >= total previous frames`` makes
        streaming bit-identical to ``synthesize`` (used by the tests).
        One caveat: the decoder right-pads inputs shorter than its first
        kernel (EnCodec minimum-length padding), so chunks under ~8 codec
        frames (~0.1 s) are not prefix-exact — production segments are
        hundreds of frames.  The final sample rate is ``self.sample_rate``.
        """
        from .codec.encodec import HOP

        phones, ids = self.phones_and_ids(text)
        if len(ids) <= self.text_len:
            row = self._prepare_ids(ids, self.prompt_codes(reference))
            if submit_row is not None:  # coalesce with batched traffic
                codes = submit_row(row, int(seed))
            else:
                codes = self.synthesize_codes_batch([row], [int(seed)])[0]
            wav, _ = self.decode_codes(codes)
            yield wav
            return

        from .longform import iter_segment_codes

        context: np.ndarray | None = None
        for codes in iter_segment_codes(
            self, text, reference, seed=seed, phones=phones,
            submit_row=submit_row,
        ):
            if context is None or not context_frames:
                wav, _ = self.decode_codes(codes)
            else:
                full, _ = self.decode_codes(np.concatenate([context, codes]))
                wav = full[..., len(context) * HOP:]
            merged = codes if context is None else np.concatenate(
                [context, codes], axis=0
            )
            context = merged[-context_frames:] if context_frames else None
            yield wav

    @property
    def sample_rate(self) -> int:
        from .codec.encodec import SAMPLE_RATE

        return SAMPLE_RATE

    def warmup(self, reference: str | Path):
        """Compile every device program once with bucket shapes — both the
        B=1 bucket and, when micro-batching, the coalesced ``max_batch``
        bucket, and both fused variants (wav-inclusive for direct requests,
        codes-only for long-form/stream segments), so no live request ever
        pays a compile."""
        self.synthesize("warm up the compiler", reference)
        row = self._prepare("warm up the compiler", reference)
        self.synthesize_codes_batch([row], [0])
        if self.max_batch > 1:
            self.synthesize_batch(
                [("warm up the compiler", reference, 0)] * 2
            )
            self.synthesize_codes_batch([row] * 2, [0, 0])
        _logger.info("Synthesizer warm")


class Batcher:
    """Coalesce concurrent requests into device batches.

    The first queued request opens a window of ``window_ms``; whatever else
    arrives before it closes (up to ``synth.max_batch``) rides the same
    device batch.  ``submit`` blocks until the request's result is ready.
    """

    def __init__(self, synth: Synthesizer, window_ms: float = 10.0):
        self.synth = synth
        self.window_s = window_ms / 1e3
        self.q: queue.Queue = queue.Queue()
        self.stats: "ServerStats | None" = None  # set by make_server
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit_row(self, row: dict, seed: int = 0) -> np.ndarray:
        """Queue one prepared request row; blocks until the device batch
        carrying it completes and returns the row's (t, 8) codec codes."""
        return self._submit(row, seed, want_wav=False)[0]

    def _submit(self, row: dict, seed: int, want_wav: bool):
        """Queue one row → (codes, wav|None).  ``want_wav`` marks the row
        as wanting the in-graph decoded waveform; the cohort runs the
        decode-inclusive program when any member wants it."""
        item = {
            "row": row,
            "seed": int(seed),
            "want_wav": bool(want_wav),
            "event": threading.Event(),
            "codes": None,
            "wav": None,
            "error": None,
        }
        self.q.put(item)
        item["event"].wait()
        if item["error"] is not None:
            raise item["error"]
        return item["codes"], item["wav"]

    def submit(self, text: str, reference: str | Path, seed: int = 0):
        synth = self.synth
        phones, ids = synth.phones_and_ids(text)
        if len(ids) > synth.text_len:
            # Long-form: a request's own segments are sequentially dependent
            # (continuation prompts), but each segment rides the shared
            # queue, coalescing with concurrent traffic at segment
            # granularity.
            from .longform import synthesize_long

            return synthesize_long(synth, text, reference, seed=seed,
                                   phones=phones, submit_row=self.submit_row)
        row = synth._prepare_ids(ids, synth.prompt_codes(reference))
        codes, wav = self._submit(row, seed, want_wav=True)
        if wav is not None:  # fused path decoded in-graph
            return wav, synth.sample_rate
        return synth.decode_codes(codes)

    def _loop(self):
        while True:
            batch = [self.q.get()]
            deadline = time.monotonic() + self.window_s
            while len(batch) < self.synth.max_batch:
                remain = deadline - time.monotonic()
                if remain <= 0:
                    break
                try:
                    batch.append(self.q.get(timeout=remain))
                except queue.Empty:
                    break
            if self.stats is not None:
                self.stats.record_batch(len(batch))
            try:
                want = any(b.get("want_wav") for b in batch)
                codes, wavs = self.synth._device_batch(
                    [b["row"] for b in batch], [b["seed"] for b in batch],
                    want_wav=want,
                )
                for i, (b, c) in enumerate(zip(batch, codes)):
                    b["codes"] = c
                    if wavs is not None:
                        b["wav"] = wavs[i]
            except Exception as e:  # noqa: BLE001 — delivered to the caller
                for b in batch:
                    b["error"] = e
            for b in batch:
                b["event"].set()


class ServerStats:
    """Thread-safe serving counters + sliding-window latency percentiles.

    The reference has no serving story at all; production operation needs
    at least: are requests completing, how fast, how full are the device
    batches, and are errors accumulating.  Kept stdlib-only like the rest
    of the server.
    """

    WINDOW = 512  # latency samples kept for percentile estimates

    def __init__(self):
        self._lock = threading.Lock()
        self._t0 = time.time()
        self.requests = 0
        self.errors = 0
        self.streams = 0
        self.rejected = 0
        self.batches = 0
        self.batched_rows = 0
        self._lat_ms: list[float] = []

    def record(self, seconds: float, *, error: bool = False,
               stream: bool = False):
        with self._lock:
            self.requests += 1
            if error:
                self.errors += 1
            if stream:
                self.streams += 1
            self._lat_ms.append(seconds * 1e3)
            if len(self._lat_ms) > self.WINDOW:
                del self._lat_ms[: -self.WINDOW]

    def record_batch(self, n_rows: int):
        with self._lock:
            self.batches += 1
            self.batched_rows += n_rows

    def record_rejected(self):
        """Load-shed (503): counted separately — rejections are not
        errors and must not pollute the latency percentiles."""
        with self._lock:
            self.rejected += 1

    def snapshot(self) -> dict:
        with self._lock:
            lat = sorted(self._lat_ms)
            pct = (
                lambda q: round(lat[min(len(lat) - 1, int(q * len(lat)))], 1)
                if lat else None
            )
            return {
                "uptime_s": round(time.time() - self._t0, 1),
                "requests": self.requests,
                "errors": self.errors,
                "rejected": self.rejected,
                "streams": self.streams,
                "latency_ms": {"p50": pct(0.5), "p90": pct(0.9),
                               "p99": pct(0.99), "n": len(lat)},
                "batches": self.batches,
                "mean_batch_occupancy": (
                    round(self.batched_rows / self.batches, 2)
                    if self.batches else None
                ),
            }


def wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        pcm = (np.clip(wav, -1, 1) * 32767.0).astype("<i2")
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def make_server(
    synth: Synthesizer,
    host: str = "127.0.0.1",
    port: int = 8400,
    batcher: Batcher | None = None,
    max_pending: int | None = 64,
):
    submit = batcher.submit if batcher is not None else synth.synthesize
    submit_row = batcher.submit_row if batcher is not None else None
    stats = ServerStats()
    if batcher is not None:
        batcher.stats = stats
    # Admission control: at most max_pending requests in flight/queued
    # across both endpoints; excess load sheds fast with 503 + Retry-After
    # instead of queueing unboundedly behind the single accelerator.
    admit = (
        threading.Semaphore(max_pending)
        if max_pending and max_pending > 0 else None
    )

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 is required for Transfer-Encoding: chunked on
        # /tts_stream (clients ignore chunked framing on a 1.0 response);
        # every non-streaming response sends Content-Length, as keep-alive
        # requires.
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):
            _logger.info("%s - %s", self.address_string(), fmt % args)

        def do_GET(self):
            if self.path == "/healthz":
                body = json.dumps({"status": "ok"}).encode()
            elif self.path == "/stats":
                snap = stats.snapshot()
                snap["prom_cache"] = {
                    "hits": synth.prom_cache_hits,
                    "misses": synth.prom_cache_misses,
                    "size": len(synth._prom_cache),
                }
                body = json.dumps(snap).encode()
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _try_admit(self) -> bool:
            """Bounded admission; sheds with 503 + Retry-After when full."""
            if admit is None or admit.acquire(blocking=False):
                return True
            stats.record_rejected()
            body = json.dumps(
                {"error": "overloaded", "retry_after_s": 1}
            ).encode()
            self.send_response(503)
            self.send_header("Retry-After", "1")
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return False

        def do_POST(self):
            if self.path == "/tts_stream":
                if not self._try_admit():
                    return
                try:
                    self._tts_stream()
                finally:
                    if admit is not None:
                        admit.release()
                return
            if self.path != "/tts":
                self.send_error(404)
                return
            if not self._try_admit():
                return
            try:
                self._tts()
            finally:
                if admit is not None:
                    admit.release()

        def _tts(self):
            t0 = time.monotonic()
            recorded = False
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                wav, sr = submit(
                    req["text"], req["reference"], int(req.get("seed", 0))
                )
                body = wav_bytes(wav, sr)
                stats.record(time.monotonic() - t0)
                recorded = True
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # noqa: BLE001
                _logger.exception("tts request failed")
                if recorded:
                    # synthesis succeeded and was counted; the response
                    # write failed (client gone) — don't double-record
                    return
                stats.record(time.monotonic() - t0, error=True)
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        def _tts_stream(self):
            """Chunked raw-PCM streaming: audio arrives per long-form
            segment, cutting time-to-first-audio for an N-segment request
            from N× to 1× the single-utterance latency."""
            import itertools

            t0 = time.monotonic()
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                gen = synth.synthesize_stream(
                    req["text"], req["reference"], int(req.get("seed", 0)),
                    submit_row=submit_row,
                )
                first = next(gen)  # synthesize before headers → errors → 500
                stats.record(time.monotonic() - t0, stream=True)
            except Exception as e:  # noqa: BLE001
                _logger.exception("tts_stream request failed")
                stats.record(time.monotonic() - t0, error=True, stream=True)
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(200)
            self.send_header(
                "Content-Type",
                f"audio/L16; rate={synth.sample_rate}; channels=1",
            )
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            try:
                for wav in itertools.chain([first], gen):
                    # RFC 2586: L16 is big-endian PCM
                    pcm = (np.clip(wav, -1.0, 1.0) * 32767.0).astype(">i2")
                    data = pcm.tobytes()
                    self.wfile.write(f"{len(data):X}\r\n".encode())
                    self.wfile.write(data)
                    self.wfile.write(b"\r\n")
                self.wfile.write(b"0\r\n\r\n")
            except Exception:  # noqa: BLE001 — headers sent; can only drop
                _logger.exception("tts_stream aborted mid-stream")
                self.close_connection = True

    return DrainingHTTPServer((host, port), Handler)


class DrainingHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer that finishes in-flight requests on shutdown.

    stdlib's ``ThreadingHTTPServer`` runs handlers on daemon threads, so a
    process exit mid-request drops the response on the floor.  Here handler
    threads are joined by ``server_close()`` (non-daemon +
    ``block_on_close``), which ``drain()`` sequences after stopping the
    accept loop — the graceful-termination contract a load balancer
    expects on SIGTERM."""

    daemon_threads = False
    block_on_close = True

    def drain(self):
        """Stop accepting, wait for in-flight handlers, release the port."""
        self.shutdown()      # stops serve_forever (idempotent)
        self.server_close()  # joins handler threads, closes the socket


def main():
    parser = argparse.ArgumentParser("TTS serving")
    parser.add_argument("--ar-ckpt", type=Path, default=Path("zoo/ar"))
    parser.add_argument("--nar-ckpt", type=Path, default=Path("zoo/nar"))
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8400)
    parser.add_argument("--warmup-reference", type=Path, default=None)
    parser.add_argument("--max-batch", type=int, default=1)
    parser.add_argument("--batch-window-ms", type=float, default=10.0)
    parser.add_argument("--max-ar-steps", type=int, default=448,
                        help="AR response bucket (AR first stages only)")
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--nar-temperature", type=float, default=0.2)
    parser.add_argument("--stride", type=int, default=1,
                        help="diffusion skip-step stride (3 ≈ 3× faster, "
                             "slight quality trade; diffusion bundles only)")
    parser.add_argument("--mesh-tp", type=int, default=1,
                        help="tensor-parallel degree: shard heads/MLP/vocab "
                             "over this many chips (1 = single device)")
    parser.add_argument("--decode", choices=("ancestral", "maskgit"),
                        default=None,
                        help="D3PM sampler (D3PM bundles only).  Default "
                             "maskgit: wins held-out accuracy AND latency "
                             "(round-4 evidence); ancestral = the "
                             "reference-parity 99-step chain.  An explicit "
                             "--stride > 1 defaults the sampler to "
                             "ancestral (stride is an ancestral knob)")
    parser.add_argument("--maskgit-steps", type=int, default=12,
                        help="denoiser evaluations for --decode maskgit")
    parser.add_argument("--draft-ckpt", type=Path, default=None,
                        help="AR draft bundle for speculative decoding "
                             "(AR first stages; exact greedy at "
                             "--temperature 0)")
    parser.add_argument("--spec-k", type=int, default=4,
                        help="draft proposals per speculative round")
    parser.add_argument("--max-pending", type=int, default=64,
                        help="admission bound: requests beyond this many "
                             "in flight are shed with 503 + Retry-After "
                             "(0 = unlimited)")
    args = parser.parse_args()
    if args.decode is None:
        args.decode = "ancestral" if args.stride > 1 else "maskgit"

    logging.basicConfig(level=logging.INFO)
    synth = Synthesizer(
        args.ar_ckpt, args.nar_ckpt, max_batch=args.max_batch,
        max_ar_steps=args.max_ar_steps, temperature=args.temperature,
        nar_temperature=args.nar_temperature, stride=args.stride,
        mesh_tp=args.mesh_tp, decode=args.decode,
        maskgit_steps=args.maskgit_steps,
        draft_ckpt=args.draft_ckpt, spec_k=args.spec_k,
    )
    if args.warmup_reference:
        synth.warmup(args.warmup_reference)
    batcher = (
        Batcher(synth, args.batch_window_ms) if args.max_batch > 1 else None
    )
    server = make_server(synth, args.host, args.port, batcher,
                         max_pending=args.max_pending)
    _logger.info(
        f"Serving on http://{args.host}:{args.port} "
        f"(max_batch={args.max_batch})"
    )

    # Graceful drain on SIGTERM/SIGINT: stop accepting, finish in-flight
    # requests, then exit 0 (shutdown() must run off the signal frame —
    # it blocks until serve_forever returns).
    import signal

    def _drain(signum, _frame):
        _logger.info("signal %d: draining in-flight requests", signum)
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _drain)
    signal.signal(signal.SIGINT, _drain)
    server.serve_forever()
    server.server_close()  # joins in-flight handler threads
    _logger.info("drained; exiting")


if __name__ == "__main__":
    main()
