"""Serving runtime: preloaded, shape-stable, warm-compiled TTS synthesis.

The reference has no serving story (its CLI reloads pickled models per
invocation, ``__main__.py:53-54``).  For production deployment this module
provides:

  - ``Synthesizer``: bundles loaded once, bf16 serving precision, every
    request padded to **fixed buckets** so all device programs are compiled
    exactly once (``warmup()`` pre-compiles them);
  - a stdlib-only threaded HTTP API:
        GET  /healthz                         → {"status": "ok"}
        POST /tts  {"text": ..., "reference": <wav path>, "seed": 0}
                                               → audio/wav bytes
    ``python -m tts_with_diffusion_model_tpu.serve --ar-ckpt zoo/ar
    --nar-ckpt zoo/nar --port 8400``

Request handling is serialized around the single accelerator (the HTTP
layer is threaded for I/O; device work takes a lock).
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import threading
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_logger = logging.getLogger(__name__)


class Synthesizer:
    """text + reference wav → wav, with compile-once fixed buckets."""

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

        self.codec = load_codec()
        self.text_len = text_len
        self.prom_len = prom_len
        self.gen_len = gen_len
        self.max_ar_steps = max_ar_steps
        self.temperature = temperature
        self.nar_temperature = nar_temperature
        self._lock = threading.Lock()

        from .models.diffusion import DiffusionModel

        self.is_diffusion = isinstance(self.first, DiffusionModel)
        if self.is_diffusion:
            c = self.first.config
            self.text_len, self.prom_len, self.gen_len = (
                c.text_len, c.prom_len, c.gen_len,
            )
            self._first_gen = jax.jit(
                lambda p, t, tm, pr, pm, r: self.first.generate(p, t, tm, pr, pm, r)
            )

    # ---------------- request path ----------------

    def _pad(self, arr: np.ndarray, length: int, extra_dims=()):
        out = np.zeros((1, length, *extra_dims), np.int32)
        mask = np.zeros((1, length), np.float32)
        n = min(len(arr), length)
        out[0, :n] = arr[:n]
        mask[0, :n] = 1
        return out, mask

    def synthesize(self, text: str, reference: str | Path, seed: int = 0):
        """Returns (wav float32 (T,), sample_rate)."""
        from .emb import g2p, qnt
        from .models.ar import ar_generate
        from .models.nar import nar_generate
        from .text.symmap import phones_to_ids

        phones = g2p.encode(text)
        ids = phones_to_ids(phones, self.phone_symmap, strict=False)
        if not ids:
            raise ValueError("no usable phones in input text")
        proms = qnt.encode_from_file(reference).T  # (t, 8)

        text_a, text_m = self._pad(np.asarray(ids, np.int32), self.text_len)
        prom_a, prom_m = self._pad(proms.astype(np.int32), self.prom_len, (8,))

        rng = jax.random.PRNGKey(seed)
        r1, r2 = jax.random.split(rng)

        with self._lock:
            if self.is_diffusion:
                toks = self._first_gen(
                    self.first_params, jnp.asarray(text_a), jnp.asarray(text_m),
                    jnp.asarray(prom_a), jnp.asarray(prom_m), r1,
                )[:, : self.gen_len]
                lvl0 = np.asarray(toks, np.int32)
                n_resp = self.gen_len
            else:
                toks, lens = ar_generate(
                    self.first, self.first_params, jnp.asarray(text_a),
                    jnp.asarray(text_m), jnp.asarray(prom_a), jnp.asarray(prom_m),
                    r1, max_steps=self.max_ar_steps,
                    sampling_temperature=self.temperature,
                )
                n_resp = self.max_ar_steps  # static bucket; mask below
                lvl0 = np.zeros((1, n_resp), np.int32)
                n = int(lens[0])
                lvl0[0, :n] = np.asarray(toks[0, :n])

            rm = np.zeros((1, n_resp), np.float32)
            n_valid = (
                self.gen_len if self.is_diffusion else max(int(lens[0]), 1)
            )
            rm[0, :n_valid] = 1
            codes = nar_generate(
                self.nar, self.nar_params, jnp.asarray(text_a),
                jnp.asarray(text_m), jnp.asarray(prom_a), jnp.asarray(prom_m),
                jnp.asarray(lvl0), jnp.asarray(rm), r2,
                sampling_temperature=self.nar_temperature,
            )
            codes = np.asarray(codes[0][:n_valid])  # (t, 8)
            wav, sr = self.codec.decode(codes.T)
        return wav, sr

    def warmup(self, reference: str | Path):
        """Compile every device program once with bucket shapes."""
        self.synthesize("warm up the compiler", reference)
        _logger.info("Synthesizer warm")


def wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        pcm = (np.clip(wav, -1, 1) * 32767.0).astype("<i2")
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def make_server(synth: Synthesizer, host: str = "127.0.0.1", port: int = 8400):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            _logger.info("%s - %s", self.address_string(), fmt % args)

        def do_GET(self):
            if self.path == "/healthz":
                body = json.dumps({"status": "ok"}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/tts":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                wav, sr = synth.synthesize(
                    req["text"], req["reference"], seed=int(req.get("seed", 0))
                )
                body = wav_bytes(wav, sr)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # noqa: BLE001
                _logger.exception("tts request failed")
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

    return ThreadingHTTPServer((host, port), Handler)


def main():
    parser = argparse.ArgumentParser("TTS serving")
    parser.add_argument("--ar-ckpt", type=Path, default=Path("zoo/ar"))
    parser.add_argument("--nar-ckpt", type=Path, default=Path("zoo/nar"))
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8400)
    parser.add_argument("--warmup-reference", type=Path, default=None)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    synth = Synthesizer(args.ar_ckpt, args.nar_ckpt)
    if args.warmup_reference:
        synth.warmup(args.warmup_reference)
    server = make_server(synth, args.host, args.port)
    _logger.info(f"Serving on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
