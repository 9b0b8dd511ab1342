"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the TPU-native way — by forcing XLA's host
platform to expose 8 virtual devices (the substitute for real ICI during CI),
so `jax.sharding.Mesh`/pjit paths compile and execute exactly as they would on
a v4-8 slice.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
