"""Emulated 64/128-bit unsigned arithmetic on 32-bit lanes.

TPUs have no 64-bit integer ALU, so every Z_q element (q up to 62 bits) is
carried as a pair of uint32 lanes ``(lo, hi)`` and wide products are computed
by 16-bit limb decomposition.  This module is the TPU-native replacement for
the reference's u64/u128 scalar arithmetic
(/root/reference/src/ring/modular.rs:7-99): instead of Rust's ``u128``
promotion, a 64x64 multiply is 16 partial 16x16 products recombined with
explicit carries, and modular reduction is Montgomery (R = 2^64) rather than
Barrett, because REDC needs only low-half and full 64x64 multiplies — both
cheap in 32-bit lanes.

Every function here maps elementwise over arbitrarily shaped uint32 arrays
(pairs ``(lo, hi)`` of identically shaped arrays) and consists purely of jnp
primitives, so it fuses under ``jax.jit`` on TPU and CPU backends alike.

Conventions
-----------
* ``u64`` value  = pair ``(lo, hi)`` of uint32 arrays: value = lo + 2^32*hi.
* ``u128`` value = 4-tuple ``(w0, w1, w2, w3)`` of uint32 arrays (little-endian).
* All per-modulus constants (q, -q^{-1} mod 2^64, R mod q, R^2 mod q) are
  precomputed host-side in :mod:`exacto_tpu.ring.hostmath` with Python ints.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
_MASK16 = 0xFFFF


# ---------------------------------------------------------------------------
# host <-> device packing helpers
# ---------------------------------------------------------------------------

def to_pair_np(x) -> tuple[np.ndarray, np.ndarray]:
    """Split host integers (Python ints / uint64 ndarray) into (lo, hi) uint32."""
    arr = np.asarray(x, dtype=np.uint64)
    lo = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (arr >> np.uint64(32)).astype(np.uint32)
    return lo, hi


def from_pair_np(lo, hi) -> np.ndarray:
    """Recombine (lo, hi) uint32 ndarrays into uint64 ndarray (host side)."""
    return np.asarray(lo, dtype=np.uint64) | (np.asarray(hi, dtype=np.uint64) << np.uint64(32))


def const_pair(value: int, shape=()) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Broadcast a Python int < 2^64 to a device (lo, hi) pair of given shape."""
    if not 0 <= value < (1 << 64):
        raise ValueError(f"const_pair value out of u64 range: {value}")
    lo = jnp.full(shape, value & 0xFFFFFFFF, dtype=U32)
    hi = jnp.full(shape, value >> 32, dtype=U32)
    return lo, hi


# ---------------------------------------------------------------------------
# 32-bit building blocks
# ---------------------------------------------------------------------------

def mul32(a, b):
    """Full 32x32 -> 64 product of uint32 arrays, as (lo, hi) uint32.

    The low word is XLA's native u32 multiply (the TPU VPU lowers it
    directly — measured 4x cheaper than assembling it from 16-bit partials);
    only the high word is built from 16x16 partial products.
    """
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    # mid1 <= (2^32 - 2^17 + 1) + (2^16 - 1) < 2^32; mid2 same bound
    mid1 = a1 * b0 + ((a0 * b0) >> 16)
    mid2 = a0 * b1 + (mid1 & _MASK16)
    hi = a1 * b1 + (mid1 >> 16) + (mid2 >> 16)
    return a * b, hi


def _carry(s, a):
    """Carry-out of unsigned wrap-around add s = a + b."""
    return (s < a).astype(U32)


def _addc(a, b, cin):
    """Add with carry-in; returns (sum, carry_out) with carry_out in {0, 1}."""
    s = a + b
    c1 = (s < a).astype(U32)
    s2 = s + cin
    c2 = (s2 < s).astype(U32)
    return s2, c1 + c2


def _subb(a, b, bin_):
    """Subtract with borrow-in; returns (diff, borrow_out) in {0, 1}."""
    d = a - b
    b1 = (a < b).astype(U32)
    d2 = d - bin_
    b2 = (d < bin_).astype(U32)
    return d2, b1 + b2


# ---------------------------------------------------------------------------
# u64 ops on (lo, hi) pairs
# ---------------------------------------------------------------------------

def add64(a, b):
    """(a + b) mod 2^64."""
    lo = a[0] + b[0]
    hi = a[1] + b[1] + _carry(lo, a[0])
    return lo, hi


def sub64(a, b):
    """(a - b) mod 2^64."""
    lo = a[0] - b[0]
    hi = a[1] - b[1] - (a[0] < b[0]).astype(U32)
    return lo, hi


def ge64(a, b):
    """a >= b, elementwise bool array."""
    return (a[1] > b[1]) | ((a[1] == b[1]) & (a[0] >= b[0]))


def gt64(a, b):
    """a > b, elementwise bool array."""
    return (a[1] > b[1]) | ((a[1] == b[1]) & (a[0] > b[0]))


def eq64(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


def is_zero64(a):
    return (a[0] == 0) & (a[1] == 0)


def select64(pred, a, b):
    """Elementwise pred ? a : b on u64 pairs."""
    return jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1])


def shr64(a, k: int):
    """Logical right shift by a static amount 0 <= k < 64."""
    if k == 0:
        return a
    if k >= 32:
        return (a[1] >> (k - 32)) if k > 32 else a[1], jnp.zeros_like(a[1])
    lo = (a[0] >> k) | (a[1] << (32 - k))
    hi = a[1] >> k
    return lo, hi


def shl64(a, k: int):
    """Left shift by a static amount 0 <= k < 64 (mod 2^64)."""
    if k == 0:
        return a
    if k >= 32:
        return jnp.zeros_like(a[0]), (a[0] << (k - 32)) if k > 32 else a[0]
    lo = a[0] << k
    hi = (a[1] << k) | (a[0] >> (32 - k))
    return lo, hi


def mul64(a, b):
    """Full 64x64 -> 128 product: returns 4-word little-endian tuple."""
    ll_lo, ll_hi = mul32(a[0], b[0])
    lh_lo, lh_hi = mul32(a[0], b[1])
    hl_lo, hl_hi = mul32(a[1], b[0])
    hh_lo, hh_hi = mul32(a[1], b[1])
    w0 = ll_lo
    w1 = ll_hi + lh_lo
    c1 = _carry(w1, ll_hi)
    w1b = w1 + hl_lo
    c2 = _carry(w1b, w1)
    w2 = lh_hi + hl_hi
    d1 = _carry(w2, lh_hi)
    w2b = w2 + hh_lo
    d2 = _carry(w2b, w2)
    w2c = w2b + c1 + c2
    d3 = (w2c < w2b).astype(U32)
    w3 = hh_hi + d1 + d2 + d3
    return w0, w1b, w2c, w3


def lowmul64(a, b):
    """(a * b) mod 2^64."""
    ll_lo, ll_hi = mul32(a[0], b[0])
    return ll_lo, ll_hi + a[0] * b[1] + a[1] * b[0]


def add128(a, b):
    """(a + b) mod 2^128 on 4-word tuples."""
    zero = jnp.zeros_like(a[0])
    w0, c0 = _addc(a[0], b[0], zero)
    w1, c1 = _addc(a[1], b[1], c0)
    w2, c2 = _addc(a[2], b[2], c1)
    w3, _ = _addc(a[3], b[3], c2)
    return w0, w1, w2, w3


def sub128(a, b):
    """(a - b) mod 2^128 on 4-word tuples."""
    zero = jnp.zeros_like(a[0])
    w0, b0 = _subb(a[0], b[0], zero)
    w1, b1 = _subb(a[1], b[1], b0)
    w2, b2 = _subb(a[2], b[2], b1)
    w3, _ = _subb(a[3], b[3], b2)
    return w0, w1, w2, w3


def ge128(a, b):
    """a >= b on 4-word tuples."""
    res = a[0] >= b[0]
    for i in (1, 2, 3):
        res = jnp.where(a[i] == b[i], res, a[i] > b[i])
    return res


def select128(pred, a, b):
    return tuple(jnp.where(pred, x, y) for x, y in zip(a, b))


def mul64x128(a, t):
    """64-bit a times 128-bit t -> 192-bit product as 6-word tuple.

    Used by wide fixed-point scaling (HPS rounding); exact.
    """
    lo = mul64(a, (t[0], t[1]))           # 4 words, weight 0
    hi = mul64(a, (t[2], t[3]))           # 4 words, weight 2^64
    zero = jnp.zeros_like(a[0])
    w0 = lo[0]
    w1 = lo[1]
    w2, c2 = _addc(lo[2], hi[0], zero)
    w3, c3 = _addc(lo[3], hi[1], c2)
    w4, c4 = _addc(hi[2], zero, c3)
    w5 = hi[3] + c4
    return w0, w1, w2, w3, w4, w5


# ---------------------------------------------------------------------------
# Montgomery arithmetic mod q (q odd, q < 2^63), R = 2^64
# ---------------------------------------------------------------------------

def redc(t, q, qinv_neg):
    """Montgomery reduction: t * R^{-1} mod q for 128-bit t < q * 2^64.

    ``q`` and ``qinv_neg`` (= -q^{-1} mod 2^64) are u64 pairs broadcastable
    against t's words.  Result is a u64 pair < q.
    """
    m = lowmul64((t[0], t[1]), qinv_neg)
    mq = mul64(m, q)
    zero = jnp.zeros_like(t[0])
    _, c0 = _addc(t[0], mq[0], zero)
    _, c1 = _addc(t[1], mq[1], c0)
    s2, c2 = _addc(t[2], mq[2], c1)
    s3, _ = _addc(t[3], mq[3], c2)
    u = (s2, s3)
    return select64(ge64(u, q), sub64(u, q), u)


def mont_mul(a, b, q, qinv_neg):
    """Montgomery product a * b * R^{-1} mod q.

    If a and b are in Montgomery form (x*R mod q), the result is (ab)*R mod q.
    Also usable "raw": mont_mul(x, c) with plain x < 2^64 and a precomputed
    constant c = (y*R mod q) yields x*y mod q for any y.
    """
    return redc(mul64(a, b), q, qinv_neg)


def shoup_mul64(x, w, wsh, q):
    """x * w mod q by Shoup's trick on u64 pairs (3 wide multiplies where
    mont_mul needs 4): t = mulhi64(x, wsh), r = x*w - t*q (both low-64),
    one conditional subtract.  `w` is a STANDARD-form constant < q < 2^63
    with precomputed companion wsh = floor(w * 2^64 / q); x < q arbitrary
    domain (a Montgomery x yields a Montgomery result).  Mirrors the
    narrow engine's shoup_mul32 (wordops32) for the pair path; the
    reference's concrete-ntt uses the same form (src/ring/ntt.rs:42-67)."""
    t = mul64(x, wsh)[2:]          # floor(x * wsh / 2^64)
    xw = lowmul64(x, w)
    tq = lowmul64(t, q)
    r = sub64(xw, tq)              # in [0, 2q)
    return select64(ge64(r, q), sub64(r, q), r)


def mod_add64(a, b, q):
    """(a + b) mod q for a, b < q < 2^63."""
    s = add64(a, b)
    return select64(ge64(s, q), sub64(s, q), s)


def mod_sub64(a, b, q):
    """(a - b) mod q for a, b < q."""
    d = sub64(a, b)
    dq = add64(d, q)
    return select64(ge64(a, b), d, dq)


def mod_neg64(a, q):
    """(-a) mod q for a < q."""
    z = is_zero64(a)
    d = sub64(q, a)
    return jnp.where(z, 0, d[0]).astype(U32), jnp.where(z, 0, d[1]).astype(U32)


def mod_from_u64(a, q, qinv_neg, r1_mont):
    """Reduce an arbitrary u64 pair a mod q.

    r1_mont is the constant R mod q (i.e. the Montgomery form of 1); then
    mont_mul(a, R mod q) = a * R * R^{-1} = a mod q.
    """
    return mont_mul(a, r1_mont, q, qinv_neg)


def mod_from_u128(t, q, qinv_neg, r1, r2):
    """Reduce an arbitrary 128-bit 4-word tuple t mod q.

    t = hi*2^64 + lo; hi*2^64 mod q = mont_mul(hi, R^2 mod q) and
    lo mod q = mont_mul(lo, R mod q); then one modular add.
    """
    lo = (t[0], t[1])
    hi = (t[2], t[3])
    lo_red = mont_mul(lo, r1, q, qinv_neg)
    hi_red = mont_mul(hi, r2, q, qinv_neg)
    return mod_add64(lo_red, hi_red, q)


def to_mont(a, q, qinv_neg, r2):
    """Convert a < q to Montgomery form: a * R mod q = mont_mul(a, R^2)."""
    return mont_mul(a, r2, q, qinv_neg)


def from_mont(a, q, qinv_neg):
    """Convert from Montgomery form: a * R^{-1} mod q."""
    zero = jnp.zeros_like(a[0])
    return redc((a[0], a[1], zero, zero), q, qinv_neg)
