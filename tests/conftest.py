"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding logic is tested on a virtual CPU mesh (the TPU-world
analogue of the reference's single-process tests); the real TPU chip is used
only by bench.py.  Must run before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU plugin registers itself via sitecustomize before conftest runs
# and latches jax_platforms; override at runtime so tests run on the virtual
# 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
