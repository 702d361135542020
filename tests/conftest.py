"""Test harness setup: force an 8-virtual-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding correctness is tested on
``xla_force_host_platform_device_count=8`` CPU devices (the analogue of the
reference's ``fix_unset_envs`` single-process "cluster",
``vall_e/utils/distributed.py:13-29``).  Must run before jax initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
# Disable the axon TPU-tunnel autoregistration for hermetic CPU tests.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402, F401
