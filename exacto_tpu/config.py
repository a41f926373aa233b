"""Execution configuration: backend-aware jit dispatch.

On accelerators, eager dispatch costs ~ms per primitive (remote transports
even more), so hot ops route through cached `jax.jit` wrappers.  On CPU (the
test environment, 2 cores) XLA compilation of the large HE graphs dominates,
so ops default to eager there.  Override with EXACTO_TPU_JIT=1/0.
"""

from __future__ import annotations

import os

import jax

_CACHE_SET = False


def enable_persistent_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at a repo-local directory.

    The axon remote-compile service can take minutes per XLA program; with
    the on-disk cache every process after the first re-runs the same shapes
    in milliseconds.  Safe to call repeatedly; no-op if the user already
    configured a cache dir.  EXACTO_TPU_CACHE=0 disables.
    """
    global _CACHE_SET
    if _CACHE_SET or os.environ.get("EXACTO_TPU_CACHE", "1") in ("0", "false"):
        return
    # CPU-only processes (tests, dryruns) skip the cache: accelerator runs
    # compile host-side CPU executables on the REMOTE compile service, whose
    # machine features differ — loading those AOT entries locally risks
    # SIGILL (and compiles are fast on CPU anyway).
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() in ("cpu",):
        _CACHE_SET = True
        return
    if jax.config.jax_compilation_cache_dir is None:
        path = path or os.environ.get(
            "EXACTO_TPU_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         ".jax_cache"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _CACHE_SET = True


def jit_enabled() -> bool:
    env = os.environ.get("EXACTO_TPU_JIT")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() != "cpu"


def pallas_ntt_enabled() -> bool:
    """Fused Pallas NTT on the narrow path (TPU backend only).

    Default ON for TPU: early in round 1 the pallas_call boundary cost more
    than the fusion it enabled (986 vs 1116 ops/s), but once the rest of the
    multiply was fused (limbconv kernel, Shoup tables) the 12-stage HBM
    round trips of the jnp NTT became the bottleneck again — measured 3539
    vs 2647 ops/s end-to-end with the kernel on.  EXACTO_TPU_PALLAS_NTT=0
    opts out (non-TPU backends run the jnp path either way).
    """
    env = os.environ.get("EXACTO_TPU_PALLAS_NTT")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def pallas_extend_enabled() -> bool:
    """Fused base-extend + aux forward NTT kernel (narrow multiply).

    Folds the CRT compose / center / reduce sweep of `_extend_to_aux` into
    the aux forward-NTT kernel.  Default ON for TPU since the batch-gridded
    variant (`extend3_ntt_fused`: one compose emits all aux limbs): 4101 vs
    3935 ops/s at batch 256.  The earlier per-aux-limb-gridded kernel
    (`extend_ntt_fused`) replicated the compose 3x and REGRESSED (3056 vs
    3543) — kept only as a test subject.  EXACTO_TPU_PALLAS_EXTEND=0 opts
    out (bit-exact either way).
    """
    env = os.environ.get("EXACTO_TPU_PALLAS_EXTEND")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def pallas_hps_enabled() -> bool:
    """Fused HPS-scale mega-kernel: INTT(ct+aux bases) + CRT/Garner glue +
    output forward NTT in one VMEM-resident pass, gridded over batch only.
    EXACTO_TPU_PALLAS_HPS=0/1 overrides."""
    env = os.environ.get("EXACTO_TPU_PALLAS_HPS")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def pallas_relin_enabled() -> bool:
    """Fused gadget-keyswitch kernel: digit extraction + per-digit NTT +
    Montgomery dot with the relin key, all VMEM-resident.
    EXACTO_TPU_PALLAS_RELIN=0 opts out."""
    env = os.environ.get("EXACTO_TPU_PALLAS_RELIN")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def pallas_limbconv_enabled() -> bool:
    """Fused Pallas tensor-product (limb convolution) kernel on the narrow
    multiply.  Default ON for the TPU backend: the jnp Karatsuba tree is
    ~250 elementwise HBM round trips per basis, the kernel is one pass
    (measured ~28ms -> ~4ms of the multiply step at batch 256, n=4096).
    EXACTO_TPU_PALLAS_LIMBCONV=0 opts out.  Non-TPU backends run the jnp
    path (the kernel's interpret mode is for parity tests only).
    """
    env = os.environ.get("EXACTO_TPU_PALLAS_LIMBCONV")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def dispatch(jitted, eager):
    """Return a callable choosing jitted vs eager per call (cheap check)."""
    def call(*args, **kwargs):
        if jit_enabled():
            return jitted(*args, **kwargs)
        return eager(*args, **kwargs)

    return call
