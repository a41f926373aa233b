"""Execution configuration: backend-aware jit dispatch.

On accelerators, eager dispatch costs ~ms per primitive (remote transports
even more), so hot ops route through cached `jax.jit` wrappers.  On CPU (the
test environment, 2 cores) XLA compilation of the large HE graphs dominates,
so ops default to eager there.  Override with EXACTO_TPU_JIT=1/0.
"""

from __future__ import annotations

import os

import jax


def jit_enabled() -> bool:
    env = os.environ.get("EXACTO_TPU_JIT")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() != "cpu"


def dispatch(jitted, eager):
    """Return a callable choosing jitted vs eager per call (cheap check)."""
    def call(*args, **kwargs):
        if jit_enabled():
            return jitted(*args, **kwargs)
        return eager(*args, **kwargs)

    return call
