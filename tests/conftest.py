"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; all sharding tests run against
XLA's host-platform device partitioning, which exercises the same
GSPMD partitioner and collectives that run on a real TPU slice.

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var,
so the CPU pin must go through jax.config before any backend init.

Set ``XIAOICESING_TESTS_ON_TPU=1`` to skip the CPU pin and run the numeric
tests against the real default backend (multi-device tests will then skip
unless 8 devices exist; expect long first-compile times on a tunneled TPU).
"""

import os

_on_tpu = os.environ.get("XIAOICESING_TESTS_ON_TPU", "") == "1"
if not _on_tpu:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _on_tpu:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # TPU f32 dots default to fast bf16 passes; golden-parity tolerances
    # (atol 1e-3 vs torch CPU) need true-f32 matmuls on chip
    jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if _on_tpu and len(devs) != 8:
        pytest.skip(f"needs 8 devices, backend has {len(devs)}")
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs
