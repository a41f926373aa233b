"""Carry lattice L = {f in Z^d : sum f_i b^i = 0 mod p} and Babai reduction.

Reference: /root/reference/src/dbfv/lattice.rs.  Host-side numpy/f64 code —
this is O(d^2) scalar work done at parameter-build time (d <= 16), exactly as
the reference keeps it outside the hot path.  The runtime degree-reduction
uses `SmallReps.compute_simple` (raw digit decomposition), matching the
reference's contract (reduction.rs:28); the Babai-reduced variant is fully
implemented and tested but, like the reference, not wired into the multiply
(ciphertext-level lattice reduction is deferred to the bootstrap story).
"""

from __future__ import annotations

import numpy as np

from ..errors import InvalidParam
from .decomposition import digit_decompose

_U64 = 1 << 64


class LatticeBasis:
    """Rows: b*e_i - e_{i+1} (i < d-1) and p*e_0; det = p (reference :40-77)."""

    def __init__(self, base: int, d: int, p: int):
        if d < 1:
            raise InvalidParam("d must be >= 1")
        if base < 2:
            raise InvalidParam("base must be >= 2")
        self.base, self.d, self.p = base, d, p
        rows = []
        for i in range(d - 1):
            row = [0] * d
            row[i] = base
            row[i + 1] = -1
            rows.append(row)
        last = [0] * d
        last[0] = p if p != 0 else _U64
        rows.append(last)
        self.basis = rows  # python ints, exact


class SmallReps:
    """Small representatives of B^j mod L for j = d..2d-2 (reference :79-122)."""

    def __init__(self, reps, base: int, d: int):
        self.reps = reps
        self.base = base
        self.d = d

    @classmethod
    def compute_simple(cls, base: int, d: int, p: int) -> "SmallReps":
        """Raw digit decomposition of b^j mod p; p=0 means 2^64 (reference :104-122)."""
        mod = _U64 if p == 0 else p
        reps = []
        for j in range(d, 2 * d - 1):
            val = pow(base, j, mod)
            reps.append([int(x) for x in digit_decompose(val, base, d)])
        return cls(reps, base, d)

    @classmethod
    def compute(cls, base: int, d: int, p: int, reducer: "LatticeReducer") -> "SmallReps":
        """Babai-reduced representatives (reference :85-100)."""
        mod = _U64 if p == 0 else p
        reps = []
        for j in range(d, 2 * d - 1):
            val = pow(base, j, mod)
            digits = [int(x) for x in digit_decompose(val, base, d)]
            reps.append(reducer.reduce_digits(digits))
        return cls(reps, base, d)


class LatticeReducer:
    """Gram-Schmidt data + Babai nearest-plane (reference :125-214)."""

    def __init__(self, base: int, d: int, p: int):
        self.basis = LatticeBasis(base, d, p)
        B = np.array(self.basis.basis, dtype=np.float64)
        d_ = self.basis.d
        b_star = np.zeros((d_, d_))
        mu = np.zeros((d_, d_))
        norms_sq = np.zeros(d_)
        for i in range(d_):
            v = B[i].copy()
            for j in range(i):
                mu[i, j] = (B[i] @ b_star[j]) / norms_sq[j] if abs(norms_sq[j]) > 1e-15 else 0.0
                v -= mu[i, j] * b_star[j]
            b_star[i] = v
            norms_sq[i] = v @ v
        self.gs_basis = b_star
        self.gs_mu = mu
        self.gs_norms_sq = norms_sq
        self.small_reps = SmallReps.compute_simple(base, d, p)

    def reduce_digits(self, digits) -> list[int]:
        """Babai nearest-plane: v - w, w in L, entries ~ b (reference :181-214)."""
        d = self.basis.d
        if len(digits) != d:
            raise InvalidParam(f"expected {d} digits, got {len(digits)}")
        t = np.array(digits, dtype=np.float64)
        B = np.array(self.basis.basis, dtype=np.float64)
        for i in reversed(range(d)):
            if abs(self.gs_norms_sq[i]) > 1e-15:
                c = round(float(t @ self.gs_basis[i]) / self.gs_norms_sq[i])
            else:
                c = 0
            t -= c * B[i]
        return [int(round(x)) for x in t]

    def reduce_digits_unsigned(self, digits, bfv_plain_mod: int) -> list[int]:
        """Reduced digits folded into [0, t) (reference :218-223)."""
        return [x % bfv_plain_mod for x in self.reduce_digits(digits)]
