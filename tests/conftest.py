"""Test harness config: force JAX onto CPU with 8 virtual devices.

CI needs no TPU: kernels are validated on the CPU backend, and the sharding
tests use an 8-device virtual CPU mesh standing in for a multi-chip slice
(SURVEY.md §4). Must run before jax initializes a backend.
"""

import os

# Hard override: the session environment pins JAX_PLATFORMS to the TPU
# backend; tests must run on CPU (set STEGOTPU_TEST_PLATFORM to override).
os.environ["JAX_PLATFORMS"] = os.environ.get("STEGOTPU_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported by sitecustomize (which captured the env's
# JAX_PLATFORMS=axon at import time) — update the live config too.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
