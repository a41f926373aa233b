"""Plaintext encodings for BFV.

Reference: /root/reference/src/bfv/encoding.rs.  Differences, deliberate:

* ``encode_scalar`` puts m in coefficient 0 only — matching the reference's
  *code* (encoding.rs:13-14), not its docstring (a documented doc-bug there).
* The reference's ``encode_simd`` is plain coefficient packing, not CRT slot
  packing (admitted at encoding.rs:31-32).  Here ``encode_coeffs`` provides
  that exact behavior, while ``encode_simd`` implements TRUE slot packing via
  the negacyclic NTT mod p (valid when p is prime and p = 1 mod 2n), so that
  plaintext-slot products really are elementwise.  ``encode_simd`` never falls back
  silently — it raises if p lacks slots.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..errors import InvalidParam
from ..params import BfvParams
from ..ring import hostmath as hm
from ..ring import ntt as nttmod


@dataclasses.dataclass
class Plaintext:
    """Coefficient-domain plaintext: uint64 coeffs [..., n] mod `modulus`.

    The analogue of the reference's CoeffPoly in plaintext space; lives on
    host (numpy) — device work happens in RNS after Delta-scaling.
    """

    coeffs: np.ndarray
    modulus: int

    @property
    def n(self) -> int:
        return self.coeffs.shape[-1]


def encode_scalar(m: int, params: BfvParams) -> Plaintext:
    """Scalar m -> constant-coefficient plaintext (reference encoding.rs:6-17)."""
    p = params.plain_modulus
    coeffs = np.zeros(params.ring_degree, dtype=np.uint64)
    coeffs[0] = m % p
    return Plaintext(coeffs=coeffs, modulus=p)


def decode_scalar(pt: Plaintext) -> int:
    """Read coefficient 0 (reference encoding.rs:20-23)."""
    return int(pt.coeffs[..., 0]) if pt.coeffs.ndim == 1 else pt.coeffs[..., 0]


def encode_coeffs(values, params: BfvParams) -> Plaintext:
    """Pack values into successive coefficients (the reference's `encode_simd`
    actual behavior, encoding.rs:26-40)."""
    p = params.plain_modulus
    n = params.ring_degree
    values = np.asarray(values, dtype=np.uint64)
    if values.shape[-1] > n:
        raise InvalidParam(f"too many values {values.shape[-1]} > n={n}")
    coeffs = np.zeros(values.shape[:-1] + (n,), dtype=np.uint64)
    coeffs[..., : values.shape[-1]] = values % np.uint64(p)
    return Plaintext(coeffs=coeffs, modulus=p)


def decode_coeffs(pt: Plaintext, count: int):
    """Read the first `count` coefficients (reference decode_simd)."""
    return pt.coeffs[..., :count]


def _check_slots(params: BfvParams):
    p, n = params.plain_modulus, params.ring_degree
    if not hm.is_prime(p) or (p - 1) % (2 * n) != 0:
        raise InvalidParam(
            f"true SIMD slots need prime p = 1 mod 2n; p={p}, n={n}. "
            "Use encode_coeffs for plain coefficient packing.")


def encode_simd(values, params: BfvParams) -> Plaintext:
    """TRUE CRT slot packing: values become evaluations at the 2n-th roots
    mod p, so plaintext multiplication acts elementwise on slots."""
    _check_slots(params)
    p, n = params.plain_modulus, params.ring_degree
    values = list(np.asarray(values, dtype=np.uint64).tolist())
    if len(values) > n:
        raise InvalidParam(f"too many slots {len(values)} > n={n}")
    evals = [int(v) % p for v in values] + [0] * (n - len(values))
    coeffs = nttmod.intt_host(evals, p)
    return Plaintext(coeffs=np.array(coeffs, dtype=np.uint64), modulus=p)


def decode_simd(pt: Plaintext, count: int):
    """Inverse of encode_simd: forward NTT mod p, read first `count` slots."""
    p = int(pt.modulus)
    evals = nttmod.ntt_host([int(c) for c in pt.coeffs], p)
    return np.array(evals[:count], dtype=np.uint64)
