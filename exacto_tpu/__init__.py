"""exacto_tpu: a TPU-native BFV + dBFV homomorphic encryption framework.

Built from scratch in JAX for TPU hardware, with the capabilities of the
Rust reference library `exacto` (BFV and "Decomposed BFV" of
Peikert-Zarchy-Zyskind 2026): Z_p plaintexts are split into d base-b digits,
each encrypted as an independent BFV ciphertext, making encrypted u64
arithmetic practical.  All ring arithmetic runs as batched 32-bit-lane
tensor kernels (no 64-bit ALU on TPU), sharded over device meshes.
"""

__version__ = "0.1.0"

from . import errors, ring  # noqa: F401
from .config import enable_persistent_cache as _epc

_epc()  # minutes-per-compile remote service; cache compiled programs on disk


def __getattr__(name):
    # lazy subpackage access: exacto_tpu.bfv, .dbfv, .bootstrap, .params,
    # .sampling, .parallel, .utils without paying import cost up front
    import importlib

    if name in ("bfv", "dbfv", "bootstrap", "params", "sampling", "parallel",
                "utils"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module 'exacto_tpu' has no attribute {name!r}")
