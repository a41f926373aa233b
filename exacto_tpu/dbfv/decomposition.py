"""Digit decomposition/recomposition for dBFV plaintexts (host side).

Reference: /root/reference/src/dbfv/decomposition.rs.  These run on Python
ints (plaintext-side, never hot); modulus == 0 is the p = 2^64 sentinel,
handled by masking instead of the reference's wrapping u64 arithmetic.
"""

from __future__ import annotations

import numpy as np

_U64 = 1 << 64


def digit_decompose(value: int, base: int, num_digits: int) -> list[int]:
    """value -> [d_0..d_{num_digits-1}], d_i in [0, base) (reference :8-16)."""
    out = []
    rem = int(value)
    for _ in range(num_digits):
        out.append(rem % base)
        rem //= base
    return out


def digit_recompose(digits, base: int, modulus: int) -> int:
    """sum d_i base^i mod p; modulus 0 means 2^64 (reference :22-34)."""
    acc = 0
    power = 1
    for d in digits:
        acc += int(d) * power
        power *= base
    return acc % _U64 if modulus == 0 else acc % modulus


def digit_recompose_signed(digits, base: int, modulus: int, bfv_plain_mod: int) -> int:
    """Centered recomposition: digits > t/2 count negative (reference :45-68).

    Essential for homomorphic sub/mul correctness — BFV limbs wrap mod t.
    """
    half_t = bfv_plain_mod // 2
    acc = 0
    power = 1
    for d in digits:
        c = int(d) - bfv_plain_mod if int(d) > half_t else int(d)
        acc += c * power
        power *= base
    return acc % _U64 if modulus == 0 else acc % modulus


def poly_digit_decompose(coeffs, base: int, num_digits: int) -> np.ndarray:
    """Coefficient-wise decomposition: [..., n] -> [..., num_digits, n] uint64
    (reference :75-90)."""
    coeffs = np.asarray(coeffs, dtype=np.uint64)
    out = np.zeros(coeffs.shape[:-1] + (num_digits, coeffs.shape[-1]), dtype=np.uint64)
    rem = coeffs.astype(object)
    for i in range(num_digits):
        out[..., i, :] = (rem % base).astype(np.uint64)
        rem = rem // base
    return out


def poly_digit_recompose(digit_polys, base: int, modulus: int) -> np.ndarray:
    """[..., d, n] -> [..., n] (reference :93-106)."""
    digit_polys = np.asarray(digit_polys, dtype=np.uint64)
    n = digit_polys.shape[-1]
    d = digit_polys.shape[-2]
    flat = digit_polys.reshape(-1, d, n)
    out = np.zeros((flat.shape[0], n), dtype=np.uint64)
    for b in range(flat.shape[0]):
        for j in range(n):
            out[b, j] = digit_recompose(flat[b, :, j], base, modulus)
    return out.reshape(digit_polys.shape[:-2] + (n,))


def poly_digit_recompose_signed(digit_polys, base: int, modulus: int,
                                bfv_plain_mod: int) -> np.ndarray:
    """[..., d, n] -> [..., n] with centered digits (reference :112-127)."""
    digit_polys = np.asarray(digit_polys, dtype=np.uint64)
    n = digit_polys.shape[-1]
    d = digit_polys.shape[-2]
    flat = digit_polys.reshape(-1, d, n)
    out = np.zeros((flat.shape[0], n), dtype=np.uint64)
    for b in range(flat.shape[0]):
        for j in range(n):
            out[b, j] = digit_recompose_signed(flat[b, :, j], base, modulus,
                                               bfv_plain_mod)
    return out.reshape(digit_polys.shape[:-2] + (n,))
