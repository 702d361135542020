"""TPU-native VALL-E-style D3PM codec-token TTS framework.

A ground-up JAX / XLA / Pallas / pjit rebuild with the capabilities of
``csulb-datascience/TTS-with-Diffusion-model`` (see SURVEY.md): zero-shot
voice-cloning TTS over discrete EnCodec RVQ codec tokens with three model
families — a causal AR transformer for level-0 tokens, a NAR AdaLN
transformer filling RVQ levels 2-8 in parallel, and a D3PM absorbing-state
discrete-diffusion generator with a DiT denoiser.
"""

__version__ = "0.1.0"

from .models import get_model  # noqa: F401
