"""Test configuration: force an 8-virtual-device CPU JAX platform.

Must run before jax is imported anywhere: the axon TPU plugin registers
itself via sitecustomize keyed on PALLAS_AXON_POOL_IPS, and multi-device
tests need xla_force_host_platform_device_count (SURVEY.md §4 test strategy).
"""
import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""      # disable axon TPU plugin
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize may already have imported jax with JAX_PLATFORMS=axon; the
# backend only initialises on first use, so forcing the platform here still
# works as long as no test module touches jax at import time before this.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
