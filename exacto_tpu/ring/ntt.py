"""Batched negacyclic NTT over Z_q[X]/(X^n + 1) on 32-bit lanes.

TPU-native replacement for the reference's `concrete-ntt` dependency
(/root/reference/src/ring/ntt.rs:42-67): a merged-twiddle (Longa-Naehrig)
Cooley-Tukey forward / Gentleman-Sande inverse transform where the psi
pre/post-twist for the negacyclic ring is folded into the twiddle tables.
Same contract as the reference plan: prime q = 1 (mod 2n), power-of-two n.

Layout: polynomials are (lo, hi) uint32 pairs of shape [..., L, n] — L RNS
primes, n last so the ring axis maps onto TPU lanes; arbitrary leading batch
dims.  All values are kept in Montgomery form (x * 2^64 mod q); the twiddle
tables are Montgomery too, so `mont_mul` keeps the form invariant through
every butterfly.  The forward output is in a fixed "bit-reversed" evaluation
order; pointwise products and automorphism-permutations all work in that
order, and the inverse transform returns natural coefficient order.

The pure-Python `ntt_host` mirror is the test oracle and is reused for
plaintext-slot encoding mod p (true SIMD packing) and for deriving the
evaluation-point exponent table that powers eval-domain automorphisms.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from . import hostmath as hm
from . import wordops as w


# ---------------------------------------------------------------------------
# host-side table construction
# ---------------------------------------------------------------------------

def build_psi_tables(q: int, n: int) -> dict[str, np.ndarray]:
    """Per-prime twiddle tables (Montgomery form) as uint64 numpy arrays.

    psi_rev[i]  = psi^{bitrev(i, log2 n)} * R  mod q
    ipsi_rev[i] = psi^{-bitrev(i, log2 n)} * R  mod q
    ninv        = n^{-1} * R  mod q
    """
    logn = n.bit_length() - 1
    psi = hm.psi_2n(q, n)
    ipsi = hm.mod_inv(psi, q)
    R = 1 << 64
    psi_rev = np.zeros(n, dtype=np.uint64)
    ipsi_rev = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        e = hm.bit_reverse(i, logn)
        psi_rev[i] = pow(psi, e, q) * R % q
        ipsi_rev[i] = pow(ipsi, e, q) * R % q
    ninv = hm.mod_inv(n, q) * R % q
    return {"psi_rev": psi_rev, "ipsi_rev": ipsi_rev, "ninv": np.uint64(ninv)}


@lru_cache(maxsize=None)
def _small_ntt_prime(n: int) -> int:
    """Smallest prime q = 1 (mod 2n) above 2^20, for order-only host math."""
    q = (1 << 20) // (2 * n) * (2 * n) + 1
    while not (hm.is_prime(q) and (q - 1) % (2 * n) == 0):
        q += 2 * n
    return q


@lru_cache(maxsize=None)
def eval_exponents(n: int) -> tuple[int, ...]:
    """Exponent e_j such that forward-NTT output j equals a(psi^{e_j}).

    The ordering is a structural property of the butterfly network (same for
    every modulus), recovered empirically by transforming the monomial X with
    a small NTT-friendly prime and taking discrete logs in <psi>.
    """
    q = _small_ntt_prime(n)
    psi = hm.psi_2n(q, n)
    dlog = {}
    acc = 1
    for k in range(2 * n):
        dlog[acc] = k
        acc = acc * psi % q
    x = [0] * n
    if n == 1:
        return (1,)
    x[1] = 1
    evals = ntt_host(x, q)
    return tuple(dlog[v] for v in evals)


@lru_cache(maxsize=None)
def eval_positions(n: int) -> dict[int, int]:
    """Inverse of eval_exponents: map exponent e (odd, < 2n) -> output index."""
    return {e: j for j, e in enumerate(eval_exponents(n))}


@lru_cache(maxsize=None)
def automorphism_perm(n: int, k: int) -> np.ndarray:
    """Gather indices applying sigma_k (X -> X^k) directly in the eval domain.

    sigma_k(a) evaluated at psi^e equals a(psi^{e*k mod 2n}), so
    out[j] = in[perm[j]] with perm[j] = position of exponent e_j * k mod 2n.
    Requires k odd (a ring automorphism of Z[X]/(X^n+1)).
    """
    if k % 2 == 0:
        raise ValueError(f"Galois element must be odd, got {k}")
    exps = eval_exponents(n)
    pos = eval_positions(n)
    return np.array([pos[(e * k) % (2 * n)] for e in exps], dtype=np.int32)


# ---------------------------------------------------------------------------
# host-side oracle NTT (python ints, standard domain)
# ---------------------------------------------------------------------------

def ntt_host(coeffs, q: int) -> list[int]:
    """Forward negacyclic NTT with Python ints (oracle / plaintext slots)."""
    a = [c % q for c in coeffs]
    n = len(a)
    logn = n.bit_length() - 1
    psi = hm.psi_2n(q, n)
    m, t = 1, n
    while m < n:
        t //= 2
        for i in range(m):
            # twiddle: psi^{bitrev(m+i, logn)} with bitrev over logn bits
            s = pow(psi, hm.bit_reverse(m + i, logn), q)
            j1 = 2 * i * t
            for j in range(j1, j1 + t):
                u = a[j]
                v = a[j + t] * s % q
                a[j] = (u + v) % q
                a[j + t] = (u - v) % q
        m *= 2
    return a


def intt_host(evals, q: int) -> list[int]:
    """Inverse negacyclic NTT with Python ints."""
    a = [e % q for e in evals]
    n = len(a)
    logn = n.bit_length() - 1
    ipsi = hm.mod_inv(hm.psi_2n(q, n), q)
    t, m = 1, n
    while m > 1:
        h = m // 2
        j1 = 0
        for i in range(h):
            s = pow(ipsi, hm.bit_reverse(h + i, logn), q)
            for j in range(j1, j1 + t):
                u, v = a[j], a[j + t]
                a[j] = (u + v) % q
                a[j + t] = (u - v) * s % q
            j1 += 2 * t
        t *= 2
        m = h
    ninv = hm.mod_inv(n, q)
    return [x * ninv % q for x in a]


# ---------------------------------------------------------------------------
# device-side batched NTT
# ---------------------------------------------------------------------------

def _b(c, extra: int):
    """Reshape per-prime constant pair ([L], [L]) with `extra` trailing 1-dims."""
    shape = c[0].shape + (1,) * extra
    return c[0].reshape(shape), c[1].reshape(shape)


def ntt_fwd(x, psi_rev, q, qinv):
    """Forward NTT on (lo, hi) of shape [..., L, n]; Montgomery in/out.

    psi_rev: (lo, hi) of shape [L, n]; q, qinv: (lo, hi) of shape [L].
    """
    lo, hi = x
    n = lo.shape[-1]
    L = lo.shape[-2]
    batch = lo.shape[:-2]
    q2, qi2 = _b(q, 2), _b(qinv, 2)
    m, t = 1, n
    while m < n:
        t //= 2
        s = (psi_rev[0][:, m:2 * m, None], psi_rev[1][:, m:2 * m, None])  # [L, m, 1]
        lo_r = lo.reshape(*batch, L, m, 2, t)
        hi_r = hi.reshape(*batch, L, m, 2, t)
        u = (lo_r[..., 0, :], hi_r[..., 0, :])
        v = w.mont_mul((lo_r[..., 1, :], hi_r[..., 1, :]), s, q2, qi2)
        top = w.mod_add64(u, v, q2)
        bot = w.mod_sub64(u, v, q2)
        lo = jnp.stack([top[0], bot[0]], axis=-2).reshape(*batch, L, n)
        hi = jnp.stack([top[1], bot[1]], axis=-2).reshape(*batch, L, n)
        m *= 2
    return lo, hi


def ntt_inv(x, ipsi_rev, ninv, q, qinv):
    """Inverse NTT on (lo, hi) of shape [..., L, n]; Montgomery in/out.

    ipsi_rev: (lo, hi) [L, n]; ninv: (lo, hi) [L]; q, qinv: (lo, hi) [L].
    """
    lo, hi = x
    n = lo.shape[-1]
    L = lo.shape[-2]
    batch = lo.shape[:-2]
    q2, qi2 = _b(q, 2), _b(qinv, 2)
    t, m = 1, n
    while m > 1:
        h = m // 2
        s = (ipsi_rev[0][:, h:2 * h, None], ipsi_rev[1][:, h:2 * h, None])  # [L, h, 1]
        lo_r = lo.reshape(*batch, L, h, 2, t)
        hi_r = hi.reshape(*batch, L, h, 2, t)
        u = (lo_r[..., 0, :], hi_r[..., 0, :])
        v = (lo_r[..., 1, :], hi_r[..., 1, :])
        top = w.mod_add64(u, v, q2)
        diff = w.mod_sub64(u, v, q2)
        bot = w.mont_mul(diff, s, q2, qi2)
        lo = jnp.stack([top[0], bot[0]], axis=-2).reshape(*batch, L, n)
        hi = jnp.stack([top[1], bot[1]], axis=-2).reshape(*batch, L, n)
        t *= 2
        m = h
    q1, qi1 = _b(q, 1), _b(qinv, 1)
    nv = _b(ninv, 1)
    return w.mont_mul((lo, hi), nv, q1, qi1)
