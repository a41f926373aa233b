"""Named parameter presets, numerically identical to the reference's
(/root/reference/src/params/presets.rs:24-98) so results are comparable.
"""

from __future__ import annotations

from functools import lru_cache

from . import BfvParams, BfvParamsBuilder, DbfvParams

#: NTT-friendly primes q = 1 (mod 2*4096), < 2^62 (reference presets.rs:9-13
#: lists 64-bit ones; we keep the working 60-bit family actually used).
PRIME_60_8192 = 1152921504606830593       # 2^60 - 2^14 + 1
PRIME_54_AUX = 18014398509998081
PRIME_55_AUX = 36028797018972161


@lru_cache(maxsize=None)
def compact_bfv() -> BfvParams:
    """n=1024, p=257, 40-bit q, 50-bit aux prime (reference presets.rs:24-35)."""
    return (BfvParamsBuilder()
            .ring_degree(1024)
            .plain_modulus(257)
            .ct_moduli([1099509805057])
            .aux_moduli([562949953443841])
            .sigma(3.2)
            .build())


@lru_cache(maxsize=None)
def small_bfv() -> BfvParams:
    """n=4096, p=65537, 60-bit q (reference presets.rs:39-51).

    Production preset: the calibrated security estimate (HE-standard
    anchors, params/security.py) is ENFORCED at >= 128 bits."""
    return (BfvParamsBuilder()
            .ring_degree(4096)
            .plain_modulus(65537)
            .ct_moduli([576460752308273153])
            .sigma(3.2)
            .min_security_bits(128)
            .build())


@lru_cache(maxsize=None)
def u64_dbfv() -> DbfvParams:
    """p=2^64, base=256, d=8; n=4096, 60-bit Q, two aux primes
    (reference presets.rs:53-75)."""
    bfv = (BfvParamsBuilder()
           .ring_degree(4096)
           .plain_modulus(1040407)
           .ct_moduli([PRIME_60_8192])
           .aux_moduli([PRIME_54_AUX, PRIME_55_AUX])
           .gadget_base(256)
           .sigma(3.2)
           .min_security_bits(128)
           .build())
    return DbfvParams.create(bfv, base=256, num_digits=8, plain_modulus=0)


@lru_cache(maxsize=None)
def compact_dbfv() -> DbfvParams:
    """p=256, base=16, d=2; n=1024, 40-bit q (reference presets.rs:77-98)."""
    bfv = (BfvParamsBuilder()
           .ring_degree(1024)
           .plain_modulus(929)
           .ct_moduli([1099509805057])
           .aux_moduli([562949953443841])
           .sigma(3.2)
           .build())
    return DbfvParams.create(bfv, base=16, num_digits=2, plain_modulus=256)
