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

# Persistent XLA compilation cache: the suite's wall time is dominated by
# CPU jit compiles of the same programs run-over-run; caching them on disk
# cuts repeat runs several-fold.  The cache dir is keyed by a host-CPU
# fingerprint: XLA:CPU AOT entries encode machine features, and loading an
# entry compiled on a different box risks SIGILL (observed as
# cpu_aot_loader "machine type doesn't match" errors when /tmp survives a
# workspace migration).
import hashlib  # noqa: E402
try:
    with open("/proc/cpuinfo") as _f:
        _flags = next((l for l in _f if l.startswith("flags")), "")
    _fp = hashlib.sha1(_flags.encode()).hexdigest()[:8]
except OSError:
    _fp = "nohost"
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("EXACTO_TPU_COMPCACHE",
                                 "/tmp/exacto_tpu_compcache_" + _fp))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
