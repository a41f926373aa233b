"""Host-side number theory over Python ints.

Everything here runs at plan/params construction time (never on device):
primality, modular inverses, primitive roots, Montgomery constants, CRT
factors.  The device-side equivalents live in :mod:`exacto_tpu.ring.wordops`.

Reference counterparts: /root/reference/src/ring/modular.rs:87-121 (mod_pow,
mod_inv), /root/reference/src/ring/ntt.rs:19-29 (plan construction requiring a
prime q = 1 mod 2n).
"""

from __future__ import annotations

from functools import lru_cache

from ..errors import InvalidParam


def mod_pow(base: int, exp: int, m: int) -> int:
    """Square-and-multiply a^exp mod m (reference modular.rs:87-99)."""
    return pow(base % m, exp, m)


def mod_inv(a: int, m: int) -> int:
    """Inverse of a mod m; raises if not invertible (reference modular.rs:102-121)."""
    a %= m
    g, x = _egcd(a, m)
    if g != 1:
        raise InvalidParam(f"{a} not invertible mod {m}")
    return x % m


def _egcd(a: int, b: int) -> tuple[int, int]:
    """Extended Euclid returning (gcd, x) with a*x = gcd (mod b)."""
    old_r, r = a, b
    old_x, x = 1, 0
    while r:
        q = old_r // r
        old_r, r = r, old_r - q * r
        old_x, x = x, old_x - q * x
    return old_r, old_x


def is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for n < 3.3e24 (covers all u64)."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d = n - 1
    r = 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def montgomery_inv_neg(q: int) -> int:
    """-q^{-1} mod 2^64 via Newton iteration (reference modular.rs:44-53)."""
    if q % 2 == 0:
        raise InvalidParam("Montgomery requires odd modulus")
    inv = q
    for _ in range(6):
        inv = (inv * (2 - q * inv)) & 0xFFFFFFFFFFFFFFFF
    return (-inv) & 0xFFFFFFFFFFFFFFFF


def mont_r1(q: int) -> int:
    """R mod q with R = 2^64 (Montgomery form of 1)."""
    return (1 << 64) % q


def mont_r2(q: int) -> int:
    """R^2 mod q with R = 2^64 (to-Montgomery conversion constant)."""
    return (1 << 128) % q


@lru_cache(maxsize=None)
def _factorize(n: int) -> tuple[int, ...]:
    """Distinct prime factors of n (trial division + Pollard rho)."""
    factors = set()

    def rho(m: int) -> int:
        if m % 2 == 0:
            return 2
        import random

        rnd = random.Random(0xEC)
        while True:
            x = rnd.randrange(2, m)
            y, c, d = x, rnd.randrange(1, m), 1
            while d == 1:
                x = (x * x + c) % m
                y = (y * y + c) % m
                y = (y * y + c) % m
                d = _gcd(abs(x - y), m)
            if d != m:
                return d

    def factor(m: int):
        if m == 1:
            return
        if is_prime(m):
            factors.add(m)
            return
        for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31):
            if m % p == 0:
                factors.add(p)
                while m % p == 0:
                    m //= p
                factor(m)
                return
        d = rho(m)
        factor(d)
        factor(m // d)

    factor(n)
    return tuple(sorted(factors))


def _gcd(a: int, b: int) -> int:
    while b:
        a, b = b, a % b
    return a


def primitive_root(q: int) -> int:
    """Smallest generator of the multiplicative group mod prime q."""
    if not is_prime(q):
        raise InvalidParam(f"{q} is not prime")
    phi = q - 1
    factors = _factorize(phi)
    g = 2
    while True:
        if all(pow(g, phi // f, q) != 1 for f in factors):
            return g
        g += 1
        if g > 1 << 20:
            raise InvalidParam(f"no primitive root found for {q}")


@lru_cache(maxsize=None)
def psi_2n(q: int, n: int) -> int:
    """A primitive 2n-th root of unity mod q (so psi^n = -1 mod q).

    Requires prime q = 1 (mod 2n) — same contract as the reference NTT plan
    (/root/reference/src/ring/ntt.rs:23-27).
    """
    if (q - 1) % (2 * n) != 0:
        raise InvalidParam(f"q={q} is not 1 mod 2n={2 * n}; no negacyclic NTT plan")
    g = primitive_root(q)
    psi = pow(g, (q - 1) // (2 * n), q)
    assert pow(psi, n, q) == q - 1, "psi^n != -1"
    return psi


def bit_reverse(x: int, bits: int) -> int:
    """Reverse the low `bits` bits of x."""
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def crt_reconstruct(residues, moduli) -> int:
    """CRT: the unique x in [0, prod(moduli)) with x = residues[i] mod moduli[i].

    Host-side BigInt CRT, the analogue of the reference's BigUint
    reconstruction (/root/reference/src/bfv/encrypt.rs:142-172).
    """
    big_q = 1
    for m in moduli:
        big_q *= m
    x = 0
    for r, m in zip(residues, moduli):
        q_star = big_q // m
        x += q_star * mod_inv(q_star % m, m) * r
    return x % big_q
