"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the TPU-native way — by forcing XLA's host
platform to expose 8 virtual devices (the substitute for real ICI during CI),
so `jax.sharding.Mesh`/pjit paths compile and execute exactly as they would on
a v4-8 slice.

NOTE: this environment's sitecustomize imports jax and registers the `axon`
TPU plugin at interpreter startup, and pins JAX_PLATFORMS=axon — so plain env
manipulation here is too late. `jax.config.update("jax_platforms", ...)` still
works because backends initialize lazily at first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU platform"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
