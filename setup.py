from pathlib import Path

from setuptools import find_packages, setup

setup(
    name="tts-with-diffusion-model-tpu",
    python_requires=">=3.10.0",
    version="0.1.0",
    description=(
        "TPU-native (JAX/XLA/Pallas/pjit) zero-shot voice-cloning TTS over "
        "discrete EnCodec codec tokens with AR, NAR, and D3PM discrete-"
        "diffusion model families"
    ),
    long_description=(Path(__file__).parent / "README.md").read_text(),
    long_description_content_type="text/markdown",
    packages=find_packages(exclude=["tests*"]),
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "numpy",
        "scipy",
        "pyyaml",
    ],
)
