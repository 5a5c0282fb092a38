"""Test configuration: force JAX onto CPU with 8 virtual devices so that
multi-chip sharding logic is exercised without TPU hardware (the driver
separately dry-runs the multichip path on the real platform).

Note: the environment's sitecustomize pre-registers the TPU (axon) PJRT
plugin and pins JAX_PLATFORMS=axon, so we must override via jax.config
*before* any backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
