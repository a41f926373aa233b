"""dBFV encryption: decompose into digits, encrypt each as a BFV limb.

Reference: /root/reference/src/dbfv/encrypt.rs.  All d limbs are encrypted
in ONE batched BFV encryption over the stacked limb axis (the reference
loops, encrypt.rs:177-229).
"""

from __future__ import annotations

import numpy as np

from ..bfv.encoding import Plaintext
from ..bfv.encrypt import encrypt_pk, encrypt_sk
from ..bfv.keygen import PublicKey, SecretKey
from ..errors import InvalidParam
from ..params import DbfvParams
from .ciphertext import DbfvCiphertext
from .decomposition import digit_decompose, poly_digit_decompose


def _digit_plaintexts_scalar(values, params: DbfvParams) -> Plaintext:
    """Scalar value(s) -> stacked digit plaintexts [..., d, n]."""
    d = params.num_digits
    n = params.bfv_params.ring_degree
    arr = np.asarray(values, dtype=np.uint64)
    out = np.zeros(arr.shape + (d, n), dtype=np.uint64)
    flat = arr.reshape(-1)
    o = out.reshape(-1, d, n)
    mod = params.effective_plain_modulus
    for idx, v in enumerate(flat):
        digits = digit_decompose(int(v) % mod, params.base, d)
        for i, dig in enumerate(digits):
            o[idx, i, 0] = dig
    return Plaintext(coeffs=out, modulus=params.bfv_params.plain_modulus)


def _validate_digit_polys(digit_coeffs: np.ndarray, params: DbfvParams):
    """Mirror of the reference validation (encrypt.rs:143-175)."""
    t = params.bfv_params.plain_modulus
    d = params.num_digits
    if digit_coeffs.shape[-2] != d:
        raise InvalidParam(f"expected {d} digit polynomials, got {digit_coeffs.shape[-2]}")
    if params.base > t:
        raise InvalidParam(f"base {params.base} exceeds BFV plaintext modulus {t}")
    if (digit_coeffs >= t).any():
        raise InvalidParam("digit coefficient >= BFV plaintext modulus")


def dbfv_encrypt(key, value, pk: PublicKey, params: DbfvParams) -> DbfvCiphertext:
    """Public-key scalar encryption (reference encrypt.rs:17-34)."""
    pt = _digit_plaintexts_scalar(value, params)
    limbs = encrypt_pk(key, pt, pk)
    return DbfvCiphertext(limbs=limbs, degree=params.num_digits, mul_depth=0,
                          params=params)


def dbfv_encrypt_sk(key, value, sk: SecretKey, params: DbfvParams) -> DbfvCiphertext:
    """Secret-key scalar encryption (reference encrypt.rs:57-74)."""
    pt = _digit_plaintexts_scalar(value, params)
    limbs = encrypt_sk(key, pt, sk)
    return DbfvCiphertext(limbs=limbs, degree=params.num_digits, mul_depth=0,
                          params=params)


def _poly_digit_plaintexts(coeffs, params: DbfvParams) -> Plaintext:
    if params.plain_modulus == 0:
        raise InvalidParam(
            "polynomial dBFV plaintexts require a finite plaintext modulus")
    coeffs = np.asarray(coeffs, dtype=np.uint64) % np.uint64(params.plain_modulus)
    if coeffs.shape[-1] != params.bfv_params.ring_degree:
        raise InvalidParam("plaintext polynomial degree mismatch")
    digits = poly_digit_decompose(coeffs, params.base, params.num_digits)
    _validate_digit_polys(digits, params)
    return Plaintext(coeffs=digits, modulus=params.bfv_params.plain_modulus)


def dbfv_encrypt_poly(key, coeffs, pk: PublicKey, params: DbfvParams) -> DbfvCiphertext:
    """Public-key polynomial encryption (reference encrypt.rs:88-118)."""
    pt = _poly_digit_plaintexts(coeffs, params)
    limbs = encrypt_pk(key, pt, pk)
    return DbfvCiphertext(limbs=limbs, degree=params.num_digits, mul_depth=0,
                          params=params)


def dbfv_encrypt_poly_sk(key, coeffs, sk: SecretKey, params: DbfvParams) -> DbfvCiphertext:
    """Secret-key polynomial encryption (reference encrypt.rs:120-141)."""
    pt = _poly_digit_plaintexts(coeffs, params)
    limbs = encrypt_sk(key, pt, sk)
    return DbfvCiphertext(limbs=limbs, degree=params.num_digits, mul_depth=0,
                          params=params)
