"""Single-lane Montgomery arithmetic for narrow primes (q < 2^31, R = 2^32).

The wide path (wordops.py) emulates 64-bit residues in uint32 pairs —
necessary for the reference's 40-60-bit prime presets, but ~4x more
multiplies than needed when the RNS basis is chosen TPU-first: several
primes just under 2^31 whose product covers the same modulus budget.  This
module is that fast path: one uint32 lane per residue, Montgomery with
R = 2^32 (a 32x32 full product is 4 sixteen-bit partials; REDC adds ~7
more), halving memory traffic and quartering multiply work.

Foundation for the narrow-basis BFV pipeline (performance presets); the
wide path remains the reference-parity path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import hostmath as hm

U32 = jnp.uint32
_MASK16 = 0xFFFF


def _u32(v):
    """Coerce python-int constants (possibly >= 2^31) to uint32 scalars."""
    return v if hasattr(v, "dtype") else jnp.uint32(v & 0xFFFFFFFF)


def check_narrow(moduli) -> bool:
    return all(1 < m < (1 << 31) and m % 2 == 1 for m in moduli)


def cond_sub32(v, q):
    """v - q if v >= q else v, for v < q + 2^31 — select-free.

    d = v - q wraps to the top half of u32 exactly when v < q (q < 2^31),
    so the SIGN BIT of d is the condition: arithmetic-shift it across the
    word and mask q back in.  sub+shift+and+add are all single-slot VPU
    ops, whereas the compare+select this replaces prices above a full
    multiply on this VPU (utils/roofline.py measured table; Mosaic has no
    vector minui, which would have been 1 op).
    """
    q = _u32(q)
    d = v - q
    mask = jnp.right_shift(d.astype(jnp.int32), 31).astype(U32)
    return d + (q & mask)


def mont_consts32(q: int) -> dict:
    """Host precompute: -q^{-1} mod 2^32, R mod q, R^2 mod q (R = 2^32)."""
    if q % 2 == 0 or q >= 1 << 31:
        raise ValueError("narrow Montgomery needs odd q < 2^31")
    inv = q
    for _ in range(5):
        inv = (inv * (2 - q * inv)) & 0xFFFFFFFF
    return {
        "qinv_neg": (-inv) & 0xFFFFFFFF,
        "r1": (1 << 32) % q,
        "r2": (1 << 64) % q,
        # Shoup companions for the constant-operand reductions
        "r1_shoup": (((1 << 32) % q) << 32) // q,
        "one_shoup": (1 << 32) // q,
    }


def mul32_full(a, b):
    """32x32 -> 64 as (lo, hi) uint32.

    Low word via XLA's native u32 multiply (the VPU lowers it directly —
    4x cheaper than assembling from 16-bit partials); high word from 16x16
    partial products (= mulhi32)."""
    return a * b, mulhi32(a, b)


def mulhi32(a, b):
    """High word of the 32x32 product only (skips the lo assembly)."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    mid1 = a1 * b0 + ((a0 * b0) >> 16)
    mid2 = a0 * b1 + (mid1 & _MASK16)
    return a1 * b1 + (mid1 >> 16) + (mid2 >> 16)


def mont_mul32(a, b, q, qinv_neg):
    """a * b * 2^{-32} mod q for a, b < q < 2^31.

    REDC shortcut: t + m*q == 0 mod 2^32 by construction, so the low-word
    sum is exactly 0 with carry-out iff t_lo != 0 — no need to compute
    (m*q)_lo at all.
    """
    q, qinv_neg = _u32(q), _u32(qinv_neg)
    t_lo, t_hi = mul32_full(a, b)
    m = t_lo * qinv_neg  # mod 2^32
    u = t_hi + mulhi32(m, q) + (t_lo != 0).astype(U32)  # < 2q < 2^32
    return cond_sub32(u, q)


def shoup_mul32(v, w, w_shoup, q):
    """v * w mod q for CONSTANT w with precomputed w_shoup = floor(w*2^32/q).

    Three mul-units (one mulhi + two native low mults) vs Montgomery's four:
    r = v*w - floor(v*w_shoup/2^32)*q lies in [0, 2q) (Shoup/Harvey), one
    conditional subtract normalizes.  Only valid when w is a fixed operand
    (twiddles, keys, scalar tables) — w_shoup is per-w precompute.
    """
    q = _u32(q)
    hi = mulhi32(v, w_shoup)
    r = v * w - hi * q  # exact mod 2^32; true value < 2q
    return cond_sub32(r, q)


def shoup_const32(w: int, q: int) -> int:
    """Host precompute floor(w * 2^32 / q) for shoup_mul32."""
    return (int(w) << 32) // int(q)


def mod_add32(a, b, q):
    q = _u32(q)
    s = a + b  # < 2q < 2^32
    return cond_sub32(s, q)


def mod_sub32(a, b, q):
    q = _u32(q)
    # a - b wraps to the top half of u32 exactly when a < b (a, b < q <
    # 2^31): sign-mask q back in, select-free (see cond_sub32)
    d = a - b
    mask = jnp.right_shift(d.astype(jnp.int32), 31).astype(U32)
    return d + (q & mask)


def mod_neg32(a, q):
    q = _u32(q)
    # q - a is in (0, q] for a in [0, q); cond_sub folds the a == 0 case
    # (q - 0 = q -> 0) without the compare+select
    return cond_sub32(q - a, q)


def to_mont32(a, q, qinv_neg, r2):
    return mont_mul32(a, _u32(r2), q, qinv_neg)


def from_mont32(a, q, qinv_neg):
    """REDC of a single word: a * 2^{-32} mod q (same carry shortcut)."""
    q, qinv_neg = _u32(q), _u32(qinv_neg)
    m = a * qinv_neg
    u = mulhi32(m, q) + (a != 0).astype(U32)
    return cond_sub32(u, q)


def reduce_u64_pair32(lo, hi, q, qinv_neg, r1, r2):
    """Arbitrary u64 (lo, hi uint32) mod q: hi*2^32 + lo via Montgomery.

    hi*2^32 mod q = mont_mul32(hi, r2); lo mod q = mont_mul32(lo, r1).
    """
    return mod_add32(mont_mul32(hi, _u32(r2), q, qinv_neg),
                     mont_mul32(lo, _u32(r1), q, qinv_neg), q)


def reduce_u64_shoup32(lo, hi, q, r1, r1_shoup, one_shoup):
    """u64 (lo, hi) mod q with Shoup products (5 mul-units vs Montgomery's
    8): hi*(2^32 mod q) via shoup_mul (3) and lo mod q via the w=1 Shoup
    form lo - floor(lo*floor(2^32/q)/2^32)*q (2)."""
    q = _u32(q)
    h = shoup_mul32(hi, _u32(r1), _u32(r1_shoup), q)
    t = lo - mulhi32(lo, _u32(one_shoup)) * q  # lo mod q, in [0, 2q)
    t = cond_sub32(t, q)
    return mod_add32(h, t, q)


def shoup_reduce32(v, q, one_shoup):
    """v mod q for v < 2^32 via the w=1 Shoup form (1 mulhi + 1 low mul)."""
    q = _u32(q)
    t = v - mulhi32(v, _u32(one_shoup)) * q
    return cond_sub32(t, q)


# ---------------------------------------------------------------------------
# narrow negacyclic NTT (same LN structure as ring.ntt, single lane)
# ---------------------------------------------------------------------------

def build_psi_tables32(q: int, n: int) -> dict:
    """Montgomery-form twiddles as uint32 (R = 2^32), plus their Shoup
    companions (floor(w*2^32/q)) — butterflies multiply by constants, so the
    3-mul Shoup product replaces the 4-mul Montgomery one."""
    logn = n.bit_length() - 1
    psi = hm.psi_2n(q, n)
    ipsi = hm.mod_inv(psi, q)
    R = 1 << 32
    psi_rev = np.zeros(n, dtype=np.uint32)
    ipsi_rev = np.zeros(n, dtype=np.uint32)
    psi_std = np.zeros(n, dtype=np.uint32)
    ipsi_std = np.zeros(n, dtype=np.uint32)
    psi_sh = np.zeros(n, dtype=np.uint32)
    ipsi_sh = np.zeros(n, dtype=np.uint32)
    for i in range(n):
        e = hm.bit_reverse(i, logn)
        w = pow(psi, e, q)
        iw = pow(ipsi, e, q)
        psi_rev[i] = w * R % q
        ipsi_rev[i] = iw * R % q
        # Shoup products have no REDC R^{-1}, so their twiddles are the
        # STANDARD-form values (Montgomery-domain data stays Montgomery)
        psi_std[i] = w
        ipsi_std[i] = iw
        psi_sh[i] = (w << 32) // q
        ipsi_sh[i] = (iw << 32) // q
    ninv = hm.mod_inv(n, q)
    # final-stage constants: mont_mul by ninv_std both inverts n and strips
    # the Montgomery factor (REDC's R^{-1}); the Shoup product has no R^{-1},
    # so its fused constant is n^{-1} * R^{-1} mod q instead.
    ninv_fuse = ninv * hm.mod_inv(R % q, q) % q
    return {"psi_rev": psi_rev, "ipsi_rev": ipsi_rev,
            "psi_std": psi_std, "ipsi_std": ipsi_std,
            "psi_shoup": psi_sh, "ipsi_shoup": ipsi_sh,
            "ninv": np.uint32(ninv * R % q), "ninv_std": np.uint32(ninv),
            "ninv_fuse": np.uint32(ninv_fuse),
            "ninv_fuse_shoup": np.uint32((ninv_fuse << 32) // q)}


def ntt_fwd32(x, psi_rev, q, qinv, psi_shoup=None):
    """Forward NTT on uint32 [..., L, n]; psi_rev [L, n]; q/qinv [L].

    With `psi_shoup` (the floor(w*2^32/q) companion table) the butterfly
    twiddle product uses the 3-mul Shoup form instead of 4-mul Montgomery —
    in that case `psi_rev` must hold the STANDARD-form twiddles (Shoup has
    no REDC R^{-1} to strip a Montgomery factor from the table).
    """
    n = x.shape[-1]
    L = x.shape[-2]
    batch = x.shape[:-2]
    q2 = q.reshape(L, 1, 1)
    qi2 = qinv.reshape(L, 1, 1)
    m, t = 1, n
    while m < n:
        t //= 2
        s = psi_rev[:, m:2 * m, None]
        xr = x.reshape(*batch, L, m, 2, t)
        u = xr[..., 0, :]
        if psi_shoup is not None:
            v = shoup_mul32(xr[..., 1, :], s, psi_shoup[:, m:2 * m, None], q2)
        else:
            v = mont_mul32(xr[..., 1, :], s, q2, qi2)
        x = jnp.stack([mod_add32(u, v, q2), mod_sub32(u, v, q2)],
                      axis=-2).reshape(*batch, L, n)
        m *= 2
    return x


def ntt_inv32(x, ipsi_rev, ninv, q, qinv, ipsi_shoup=None, ninv_shoup=None):
    """Inverse NTT on uint32 [..., L, n].

    `ninv` in Montgomery form keeps the output in the input's domain
    (Montgomery in, Montgomery out); passing plain n^{-1} mod q (standard
    form) fuses the from-Montgomery conversion into the final multiply for
    free: mont_mul(x*R, n^{-1}) = x*n^{-1} in standard form.  Shoup
    companion tables switch the twiddle products to the 3-mul form; then
    `ipsi_rev` must hold STANDARD-form twiddles and `ninv` the fused
    constant n^{-1} R^{-1} (tables' "ninv_fuse").
    """
    n = x.shape[-1]
    L = x.shape[-2]
    batch = x.shape[:-2]
    q2 = q.reshape(L, 1, 1)
    qi2 = qinv.reshape(L, 1, 1)
    t, m = 1, n
    while m > 1:
        h = m // 2
        s = ipsi_rev[:, h:2 * h, None]
        xr = x.reshape(*batch, L, h, 2, t)
        u = xr[..., 0, :]
        v = xr[..., 1, :]
        top = mod_add32(u, v, q2)
        diff = mod_sub32(u, v, q2)
        if ipsi_shoup is not None:
            bot = shoup_mul32(diff, s, ipsi_shoup[:, h:2 * h, None], q2)
        else:
            bot = mont_mul32(diff, s, q2, qi2)
        x = jnp.stack([top, bot], axis=-2).reshape(*batch, L, n)
        t *= 2
        m = h
    if ninv_shoup is not None:
        return shoup_mul32(x, ninv.reshape(L, 1), ninv_shoup.reshape(L, 1),
                           q.reshape(L, 1))
    return mont_mul32(x, ninv.reshape(L, 1), q.reshape(L, 1), qinv.reshape(L, 1))
