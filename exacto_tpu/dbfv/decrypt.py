"""dBFV decryption: decrypt limbs, signed-recompose digits.

Reference: /root/reference/src/dbfv/decrypt.rs.  All limbs decrypt in one
batched BFV decryption; recomposition interprets digits > t/2 as negative
(essential after homomorphic sub/mul).
"""

from __future__ import annotations

import numpy as np

from ..bfv.encrypt import decrypt as bfv_decrypt
from ..bfv.keygen import SecretKey
from ..errors import InvalidParam
from .ciphertext import DbfvCiphertext
from .decomposition import poly_digit_recompose_signed


def dbfv_decrypt_poly(ct: DbfvCiphertext, sk: SecretKey) -> np.ndarray:
    """Decrypt to polynomial coefficients mod p (reference decrypt.rs:51-79)."""
    params = ct.params
    if params.plain_modulus == 0:
        raise InvalidParam("polynomial decryption requires a finite plaintext modulus")
    digits = bfv_decrypt(ct.limbs, sk).coeffs  # [..., d, n]
    return poly_digit_recompose_signed(digits, params.base, params.plain_modulus,
                                       params.bfv_params.plain_modulus)


def dbfv_decrypt(ct: DbfvCiphertext, sk: SecretKey):
    """Decrypt to scalar(s): recompose digit constant terms
    (reference decrypt.rs:20-45)."""
    params = ct.params
    digits = bfv_decrypt(ct.limbs, sk).coeffs  # [..., d, n]
    # scalar payloads live in coefficient 0 of each digit poly
    const_terms = digits[..., :1]  # [..., d, 1]
    vals = poly_digit_recompose_signed(const_terms, params.base,
                                       params.plain_modulus,
                                       params.bfv_params.plain_modulus)
    vals = vals[..., 0]
    return int(vals) if vals.ndim == 0 else vals
