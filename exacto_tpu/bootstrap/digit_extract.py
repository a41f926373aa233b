"""Rounding polynomial, Lagrange interpolation, Paterson-Stockmeyer eval.

Reference: /root/reference/src/bootstrap/digit_extract.rs.  The rounding
polynomial and its Lagrange interpolation are host-side Python-int
precomputation (keygen time); the Paterson-Stockmeyer homomorphic evaluation
runs on device and is batch-aware: one call evaluates the polynomial on ALL
slot ciphertexts at once (the reference maps over slots sequentially,
bfv_host.rs:192-194).
"""

from __future__ import annotations

import numpy as np

from ..bfv import BfvCiphertext
from ..bfv.encoding import Plaintext
from ..bfv.encrypt import scale_plaintext
from ..bfv.eval import bfv_add, bfv_mul_and_relin, bfv_plain_mul
from ..bfv.keygen import RelinKey
from ..params import BfvParams
from ..ring import hostmath as hm
from ..ring.rns import rp_zero


def compute_rounding_poly(t_orig: int, q_prime: int, t_boot: int) -> list[int]:
    """g(x) = round(t_orig * (x cmod q') / q') mod t_orig, tabulated over
    [0, t_boot) and Lagrange-interpolated (reference digit_extract.rs:19-29).

    DIVERGENCE (correctness fix): the tabulation interprets x in CENTERED form
    (x > t_boot/2 means x - t_boot) before reducing mod q'.  The re-encrypted
    phase is an integer v with |v| up to ~q'*(n+2)/2 that the bootstrap
    ciphertext holds mod t_boot; the reference's uncentered table
    (digit_extract.rs:20-27) is only correct when v happens to land in
    [0, t_boot), which fails for roughly half of honest encryptions (negative
    phase values).  Centered tabulation is correct whenever |v| < t_boot/2 —
    pick t_boot accordingly (see recommended_t_boot).

    The table also PRE-SCALES the recovered digit into the boot plaintext
    space: output round(m * t_boot / t_orig) instead of m.  This makes the
    final return-to-original-scheme conversion a PURE modulus switch
    (phase (Q_b/t_b)*m~ ~= (Q_b/t_orig)*m scales to (q/t_orig)*m under
    c -> round(c*q/Q_b)); a combined modulus+plain-modulus switch is unsound
    because Q_b-wraps of the phase would scale to non-multiples of q
    (error (t_b mod t_orig)/t_orig * q per wrap).
    """
    values = []
    for x in range(t_boot):
        xc = x - t_boot if x > t_boot // 2 else x
        reduced = xc % q_prime
        m = ((t_orig * reduced + q_prime // 2) // q_prime) % t_orig
        values.append(((2 * m * t_boot + t_orig) // (2 * t_orig)) % t_boot)
    return lagrange_interpolate(values, t_boot)


def recommended_t_boot(n: int, q_prime: int, secret_weight: int | None = None) -> int:
    """Smallest safe t_boot bound: the centered phase |v| stays below
    (q'/2)*(h+1) + q'/2 for secret Hamming weight h (<= n); return the
    worst-case 2*range+1 the caller should exceed with a prime."""
    h = n if secret_weight is None else secret_weight
    rng = (q_prime // 2) * (h + 1) + q_prime // 2
    return 2 * rng + 1


def lagrange_interpolate(values, p: int) -> list[int]:
    """Dense Lagrange interpolation at points 0..n-1 over Z_p (prime p).

    Reference digit_extract.rs:37-90; O(n^2) host work with Python ints.
    """
    n = len(values)
    if n == 0:
        return []
    if n == 1:
        return [values[0] % p]

    result = [0] * n
    for j in range(n):
        if values[j] % p == 0:
            continue
        # numerator polynomial prod_{k != j} (x - k)
        num = [0] * n
        num[0] = 1
        deg = 0
        for k in range(n):
            if k == j:
                continue
            neg_k = (-k) % p
            new_num = [0] * n
            for d in range(deg + 1):
                if d + 1 < n:
                    new_num[d + 1] = (new_num[d + 1] + num[d]) % p
                new_num[d] = (new_num[d] + num[d] * neg_k) % p
            num = new_num
            deg += 1
        denom = 1
        for k in range(n):
            if k != j:
                denom = denom * ((j - k) % p) % p
        scale = values[j] % p * hm.mod_inv(denom, p) % p
        for d in range(n):
            result[d] = (result[d] + num[d] * scale) % p
    return result


def trivial_encrypt(m: int, params: BfvParams) -> BfvCiphertext:
    """Noiseless ct = (Delta*m, 0) (reference digit_extract.rs:161-177)."""
    coeffs = np.zeros(params.ring_degree, dtype=np.uint64)
    coeffs[0] = m % params.plain_modulus
    return trivial_encrypt_poly(Plaintext(coeffs=coeffs,
                                          modulus=params.plain_modulus), params)


def trivial_encrypt_poly(plaintext: Plaintext, params: BfvParams) -> BfvCiphertext:
    """Noiseless ct = (Delta*m(X), 0) (reference digit_extract.rs:180-189)."""
    c0 = scale_plaintext(plaintext, params)
    c1 = rp_zero(params.ct_basis, c0.batch_shape)
    return BfvCiphertext(c=(c0, c1), params=params)


def _scalar_plain_mul(ct: BfvCiphertext, scalar: int) -> BfvCiphertext:
    params = ct.params
    coeffs = np.zeros(params.ring_degree, dtype=np.uint64)
    coeffs[0] = scalar % params.plain_modulus
    return bfv_plain_mul(ct, Plaintext(coeffs=coeffs, modulus=params.plain_modulus))


def eval_poly_homomorphic(ct_x: BfvCiphertext, poly_coeffs,
                          rlk: RelinKey) -> BfvCiphertext:
    """Paterson-Stockmeyer: f(ct) with ~2*sqrt(deg) ct-ct multiplies
    (reference digit_extract.rs:100-157).  Batch-aware: a batched ct_x
    evaluates f on every slot simultaneously.
    """
    params = ct_x.params
    coeffs = [int(c) for c in poly_coeffs]
    d = max(len(coeffs) - 1, 0)
    if d == 0:
        return trivial_encrypt(coeffs[0] if coeffs else 0, params)

    k = max(int(np.ceil(np.sqrt(d + 1))), 2)

    # baby steps x^0..x^k via balanced product tree
    baby = [trivial_encrypt(1, params), ct_x]
    for i in range(2, k + 1):
        half = i // 2
        baby.append(bfv_mul_and_relin(baby[half], baby[i - half], rlk))

    # giant-step groups g_i(x) = sum_j coeffs[i*k+j] x^j
    num_groups = (d + k) // k
    groups = []
    for i in range(num_groups):
        group_ct = trivial_encrypt(0, params)
        for j in range(k):
            idx = i * k + j
            if idx >= len(coeffs):
                break
            if coeffs[idx] == 0:
                continue
            group_ct = bfv_add(group_ct, _scalar_plain_mul(baby[j], coeffs[idx]))
        groups.append(group_ct)

    # Horner on x^k
    result = groups.pop()
    x_k = baby[k]
    while groups:
        result = bfv_mul_and_relin(result, x_k, rlk)
        result = bfv_add(result, groups.pop())
    return result
