"""Test harness config: run all tests on a virtual 8-device CPU mesh.

The reference has no automated test suite at all (SURVEY.md section 4); this
framework's tests are designed from scratch. Multi-chip paths are exercised the
JAX-native way: 8 fake host devices via XLA_FLAGS, no cluster required.

NOTE: under the axon harness the JAX_PLATFORMS *env var* is ignored (the axon
PJRT plugin claims the backend regardless); only the in-process
``jax.config.update("jax_platforms", ...)`` actually forces CPU. Without it the
whole suite silently runs over the TPU tunnel — slow, and conv numerics differ.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# This box has a single CPU core: XLA CPU compiles are expensive. Persist them
# so test reruns only pay for changed graphs.
jax.config.update("jax_compilation_cache_dir", "/tmp/aid_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()


def pytest_collection_modifyitems(items):
    # Tier the suite: anything not explicitly ``slow`` is ``quick``, so
    # ``pytest -m quick`` gives a fast green/red and ``-m "not slow"`` works
    # without every test author opting in.
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
