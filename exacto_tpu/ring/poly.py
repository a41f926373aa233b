"""Host-side coefficient-domain polynomial oracles.

Exact Python-int models used as correctness oracles by the test suite, the
same role as the reference's test-only schoolbook multiply
(/root/reference/src/ring/poly.rs:83-120).  Device polynomials live in
:mod:`exacto_tpu.ring.rns`.
"""

from __future__ import annotations


def negacyclic_mul_host(a, b, q: int):
    """Schoolbook negacyclic multiply over Z_q[X]/(X^n+1), Python ints."""
    n = len(a)
    assert len(b) == n
    out = [0] * n
    for i, ai in enumerate(a):
        if ai == 0:
            continue
        for j, bj in enumerate(b):
            if bj == 0:
                continue
            k = i + j
            if k < n:
                out[k] = (out[k] + ai * bj) % q
            else:
                out[k - n] = (out[k - n] - ai * bj) % q
    return out


def poly_add_host(a, b, q: int):
    return [(x + y) % q for x, y in zip(a, b)]


def centered(coeffs, q: int):
    """Map [0, q) representatives to centered (-q/2, q/2] form.

    Same convention as the reference (poly.rs:138-147): values > q/2 become
    negative.
    """
    half = q // 2
    return [c - q if c > half else c for c in coeffs]


def automorphism_host(coeffs, k: int, q: int):
    """sigma_k: X^i -> X^{ik} mod (X^n+1), signed permutation of coefficients.

    Mirrors /root/reference/src/bfv/keygen.rs:218-239.
    """
    n = len(coeffs)
    out = [0] * n
    for i, c in enumerate(coeffs):
        if c == 0:
            continue
        e = (i * k) % (2 * n)
        if e < n:
            out[e] = (out[e] + c) % q
        else:
            out[e - n] = (out[e - n] - c) % q
    return out


def monomial_mul_host(coeffs, j: int, q: int):
    """X^j * a(X) mod (X^n+1) (reference eval.rs:635-652)."""
    n = len(coeffs)
    j %= 2 * n
    out = [0] * n
    for i, c in enumerate(coeffs):
        if c == 0:
            continue
        k = (i + j) % (2 * n)
        if k < n:
            out[k] = (out[k] + c) % q
        else:
            out[k - n] = (out[k - n] - c) % q
    return out
