"""RLWE security estimation (simplified core-SVP / GSA heuristic).

Same role as /root/reference/src/params/security.rs (which is dead code
there); here the builder can optionally enforce it
(`BfvParamsBuilder.min_security_bits`).  For production parameters,
cross-validate with the lattice-estimator Sage tool.
"""

from __future__ import annotations

import math


def estimate_security_bits(ring_degree: int, log2_q: float, sigma: float = 3.2) -> float:
    """Core-SVP bit-security estimate for RLWE(n, q, sigma) with ternary secret.

    Model: the uSVP attack on the (2n+1)-dim embedding succeeds with BKZ
    block size beta when the GSA predicts the projected target shorter than
    the (d-beta)-th Gram-Schmidt norm; bit security = 0.292 * beta
    (classical sieving).  Solved here by scanning beta.
    """
    n = float(ring_degree)
    if log2_q <= 0:
        return float("inf")
    d = 2.0 * n + 1.0
    log_sigma = math.log2(max(sigma, 0.5))
    for beta in range(50, 1200, 2):
        b = float(beta)
        # root-Hermite factor for BKZ-beta (Chen-Nguyen asymptotic)
        delta = ((b / (2 * math.pi * math.e)) * (math.pi * b) ** (1.0 / b)) ** (1.0 / (2.0 * (b - 1.0)))
        log_delta = math.log2(delta)
        # uSVP win condition (Alkim et al. 2016 form):
        # sqrt(beta) * sigma  <=  delta^(2 beta - d) * q^(n/d)
        lhs = 0.5 * math.log2(b) + log_sigma
        rhs = (2.0 * b - d) * log_delta + (n / d) * log2_q
        if lhs <= rhs:
            return 0.292 * b
    return float("inf")


def check_security(ring_degree: int, log2_q: float, sigma: float, min_bits: float) -> bool:
    return estimate_security_bits(ring_degree, log2_q, sigma) >= min_bits


def min_ring_degree(log2_q: float, sigma: float, target_bits: float) -> int:
    n = 1024
    while n <= 65536:
        if estimate_security_bits(n, log2_q, sigma) >= target_bits:
            return n
        n *= 2
    return n
