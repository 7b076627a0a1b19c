"""Test harness config: run everything on a virtual 8-device CPU mesh.

This mirrors the driver's multi-chip dry-run environment
(xla_force_host_platform_device_count) so v5e-8 sharding semantics are
exercised without TPU hardware (SURVEY.md §4 item 4).

Must run before the first `import jax` anywhere in the test process.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
