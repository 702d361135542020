"""TPU-native VALL-E-style D3PM codec-token TTS framework.

A ground-up JAX / XLA / Pallas / pjit rebuild with the capabilities of
``csulb-datascience/TTS-with-Diffusion-model`` (see SURVEY.md): zero-shot
voice-cloning TTS over discrete EnCodec RVQ codec tokens with three model
families — a causal AR transformer for level-0 tokens, a NAR AdaLN
transformer filling RVQ levels 2-8 in parallel, and a D3PM absorbing-state
discrete-diffusion generator with a DiT denoiser.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compile cache for every entry point (TPU compiles take
# minutes through this environment's tunnel; repeat launches — the
# crash-loop wrapper, soak phase 2, preprocessing CLIs — should pay them
# once).  Opt out with TTS_TPU_NO_COMPILE_CACHE=1 or override the
# directory with JAX_COMPILATION_CACHE_DIR.
if not _os.environ.get("TTS_TPU_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        # Respect a cache dir the embedding application configured before
        # importing this package; otherwise prefer the env var, then a
        # repo-local .jax_cache — but only if that location is writable
        # (a pip install into read-only site-packages must not emit
        # per-compile write warnings).
        if not _jax.config.jax_compilation_cache_dir:
            _dir = _os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"),
            )
            _parent = _os.path.dirname(_os.path.abspath(_dir))
            if _os.access(_parent, _os.W_OK):
                _jax.config.update("jax_compilation_cache_dir", _dir)
                _jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 2
                )
    except Exception:  # pragma: no cover — cache is best-effort
        pass

from .models import get_model  # noqa: F401
