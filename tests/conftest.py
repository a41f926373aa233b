"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding logic is tested on a virtual CPU mesh (the TPU-world
analogue of the reference's single-process tests); the real TPU chip is used
only by bench.py.  Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
