"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so mesh-sharded
paths (per-shard top-K + cross-shard merge) are exercised without TPU
hardware, per SURVEY.md section 4. Pallas kernels run in interpret mode on
CPU (handled inside outline_rag_tpu.ops via backend detection).

Note: this environment registers an `axon` TPU PJRT plugin via
sitecustomize and forces ``jax_platforms=axon,cpu``; plain JAX_PLATFORMS
env vars are overridden, so we flip the config programmatically before any
backend initialization. Set ORT_TESTS_ON_TPU=1 to run the suite against
the real chip instead.
"""

import os

import jax

if os.environ.get("ORT_TESTS_ON_TPU", "") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
