"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; all sharding tests run against
XLA's host-platform device partitioning, which exercises the same
GSPMD partitioner and collectives that run on a real TPU slice.

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var,
so the CPU pin must go through jax.config before any backend init.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs
