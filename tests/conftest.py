"""Test config: force CPU with 8 virtual devices BEFORE jax initializes.

Multi-chip sharding paths (pjit over a Mesh) are exercised on an
8-device virtual CPU mesh, per SURVEY.md §4's test-strategy mapping.
"""

import os
import sys

# NOTE: the axon TPU plugin overrides JAX_PLATFORMS; JAX_PLATFORM_NAME wins.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Scrub the TPU plugin's trigger so test SUBPROCESSES (CLI drives,
# multihost workers, bench smoke) never register it: jax's backends()
# initializes EVERY registered plugin even when CPU is selected, and
# the plugin's init blocks on its (tunneled) transport — a down tunnel
# hangs otherwise-pure-CPU tests for minutes.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Same hang for THIS process (the plugin registered at interpreter
# start, before conftest ran): deregister its backend factory so the
# first jax.devices() doesn't try to initialize it. Best-effort — the
# private attr may move across jax versions; tests still pass without
# it whenever the transport is healthy.
try:  # pragma: no cover - environment-dependent
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
