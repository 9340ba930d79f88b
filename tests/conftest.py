"""Test config: run all tests on a virtual 8-device CPU mesh.

Must set env vars BEFORE jax initializes a backend — this file is imported
by pytest before any test module imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon site hook force-sets jax_platforms="axon,cpu" at jax import time;
# override it back to cpu before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
