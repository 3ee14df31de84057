"""Test fixtures.

Tests run on CPU with 8 virtual devices (the no-hardware stand-in for a
TPU slice, SURVEY.md §4 implication (c)). Pallas kernels run in
interpreter mode on CPU; the same tests run compiled on real TPU when
one is present and VLLM_TPU_TEST_ON_TPU=1.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if not os.environ.get("VLLM_TPU_TEST_ON_TPU"):
    # Force CPU even when the axon/TPU plugin is registered. Must happen
    # before any backend is initialized.
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
