"""Test harness config: run all tests on a virtual 8-device CPU mesh.

The reference has no automated test suite at all (SURVEY.md section 4); this
framework's tests are designed from scratch. Multi-chip paths are exercised the
JAX-native way: 8 fake host devices via XLA_FLAGS, no cluster required.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
