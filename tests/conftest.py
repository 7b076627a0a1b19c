"""Test harness config: run everything on a virtual 8-device CPU mesh.

This mirrors the driver's multi-chip dry-run environment
(xla_force_host_platform_device_count) so v5e-8 sharding semantics are
exercised without TPU hardware (SURVEY.md §4 item 4).

NOTE: this machine's sitecustomize (axon) pins JAX_PLATFORMS=axon (the real
TPU tunnel) at interpreter start, so setting the env var here is NOT enough;
jax.config.update('jax_platforms', ...) after import is what actually wins.
XLA_FLAGS must still be set before the first backend init.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    devices = jax.devices()
    assert devices[0].platform == "cpu" and len(devices) == 8, devices
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
