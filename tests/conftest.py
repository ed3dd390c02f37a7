"""Test config: force CPU with 8 virtual devices BEFORE jax initializes.

Multi-chip sharding paths (pjit over a Mesh) are exercised on an
8-device virtual CPU mesh, per SURVEY.md §4's test-strategy mapping.
"""

import os
import sys

# NOTE: the axon TPU plugin overrides JAX_PLATFORMS; JAX_PLATFORM_NAME wins.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
