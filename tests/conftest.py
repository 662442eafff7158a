"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so mesh-sharded
paths (per-shard top-K + cross-shard merge) are exercised without TPU
hardware, per SURVEY.md section 4. Pallas kernels run in interpret mode on
CPU (handled inside outline_rag_tpu.ops via backend detection).
"""

import os

# Must be set before the first jax import anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
