"""Gadget decomposition and key switching (relinearization).

Reference: /root/reference/src/bfv/keyswitch.rs.  The balanced digit
decomposition is redesigned branchless for TPU: instead of the reference's
per-coefficient signed i128 loop (keyswitch.rs:24-43), we decompose the
*magnitude* of the centered value into unsigned power-of-two digits, convert
to balanced digits with a vectorized carry chain, and apply the global sign
at the end.  The digit multiset differs from the reference only at the
boundary value +-base/2 (both are valid balanced decompositions with the same
reconstruction and the same noise bound).

Requires a single-prime ciphertext modulus (all presets) — for multi-prime Q
the digits of the CRT-composed coefficient are produced on host by the exact
fallback in :mod:`exacto_tpu.bfv.eval`.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import config as _config
from ..errors import NotImplementedYet
from ..params import BfvParams
from ..ring import wordops as w
from ..ring.rns import RnsBasis, RnsPoly, from_coeff_residues, rp_add, to_coeff_residues
from . import BfvCiphertext


def gadget_decompose_device(params: BfvParams, coeff_pair):
    """Balanced base-B digits of centered coefficients, as an RnsPoly stack.

    coeff_pair: (lo, hi) [..., n] standard-form values in [0, q), single
    prime q.  Returns an RnsPoly with a digit axis at -3: [..., D, L, n],
    already NTT-transformed, ready for the key-switch inner product.
    """
    if len(params.moduli) != 1:
        raise NotImplementedYet("device gadget decomposition needs single-prime Q")
    q_int = params.moduli[0]
    B = params.gadget_base
    D = params.gadget_digits
    logB = B.bit_length() - 1
    half_b = B // 2
    basis = params.ct_basis

    q = w.const_pair(q_int)
    half_q = w.const_pair(q_int // 2)
    c = coeff_pair
    neg = w.gt64(c, half_q)
    mag = w.select64(neg, w.sub64(q, c), c)

    # unsigned digit extraction (B a power of two)
    raw = []
    for i in range(D):
        d = w.shr64(mag, i * logB)[0] & (B - 1)
        raw.append(d)

    # balanced conversion with carry chain: digit in [-B/2, B/2]
    signs = []   # True where digit negative
    mags = []    # magnitude < = B/2 (uint32)
    carry = jnp.zeros_like(raw[0])
    for i in range(D):
        v = raw[i] + carry
        ge = v >= half_b
        mags.append(jnp.where(ge, B - v, v).astype(jnp.uint32))
        signs.append(ge)
        carry = ge.astype(jnp.uint32)

    # apply global sign and map to residues mod every prime
    qlo, qhi = basis.bq(1)
    lo_list, hi_list = [], []
    for i in range(D):
        final_neg = signs[i] ^ neg          # [..., n]
        dmag = mags[i][..., None, :]        # add L axis
        fneg = final_neg[..., None, :]
        nonzero = dmag != 0
        neg_lo, neg_hi = w.sub64((qlo, qhi), (dmag, jnp.zeros_like(dmag)))
        lo_list.append(jnp.where(fneg & nonzero, neg_lo, dmag))
        hi_list.append(jnp.where(fneg & nonzero, neg_hi, jnp.zeros_like(dmag)))

    lo = jnp.stack(lo_list, axis=-3)  # [..., D, L, n]
    hi = jnp.stack(hi_list, axis=-3)
    return from_coeff_residues(basis, (lo, hi))


def keyswitch_inner_product(basis: RnsBasis, digits: RnsPoly, ks0: RnsPoly,
                            ks1: RnsPoly):
    """(sum_i d_i * ks0_i, sum_i d_i * ks1_i) over the digit axis at -3."""
    q = basis.bq(1)
    qinv = basis.bqinv(1)
    D = digits.lo.shape[-3]

    def accum(key_poly):
        prod = w.mont_mul(digits.pair, key_poly.pair, q, qinv)  # [..., D, L, n]
        acc = (prod[0][..., 0, :, :], prod[1][..., 0, :, :])
        for i in range(1, D):
            acc = w.mod_add64(acc, (prod[0][..., i, :, :], prod[1][..., i, :, :]), q)
        return RnsPoly(lo=acc[0], hi=acc[1])

    return accum(ks0), accum(ks1)


def gadget_digits_rns(params: BfvParams, poly: RnsPoly) -> RnsPoly:
    """Balanced gadget digits of an RnsPoly, ready for key switching.

    Single-prime Q: fully on-device.  Multi-prime Q: exact host fallback —
    CRT-compose each coefficient, decompose with Python ints, rebuild (the
    reference CRT-composes via RnsPoly::to_coeff_poly, keyswitch.rs:76).
    """
    basis = params.ct_basis
    if len(params.moduli) == 1:
        res = to_coeff_residues(basis, poly)
        return gadget_decompose_device(params, (res[0][..., 0, :], res[1][..., 0, :]))

    import numpy as np

    from ..ring.rns import crt_to_ints_host, from_host_residues, to_u64_host

    residues = to_u64_host(basis, poly)
    xs = crt_to_ints_host(basis, residues)
    big_q = params.big_q
    half_q = big_q >> 1
    B = params.gadget_base
    D = params.gadget_digits
    n = params.ring_degree
    L = basis.num_moduli
    flat = xs.reshape(-1, n)
    out = np.zeros((flat.shape[0], D, L, n), dtype=np.uint64)
    for b in range(flat.shape[0]):
        for pos in range(n):
            rem = int(flat[b, pos])
            rem = rem - big_q if rem > half_q else rem
            for d in range(D):
                r = rem % B
                if r >= B // 2:
                    r -= B
                for li, m in enumerate(basis.moduli):
                    out[b, d, li, pos] = r % m
                rem = (rem - r) // B
    out = out.reshape(xs.shape[:-1] + (D, L, n))
    return from_host_residues(basis, out)


def _relinearize_impl(ct: BfvCiphertext, rlk) -> BfvCiphertext:
    params = ct.params
    basis = params.ct_basis
    digits = gadget_digits_rns(params, ct.c[2])
    d0, d1 = keyswitch_inner_product(basis, digits, rlk.rlk0, rlk.rlk1)
    return BfvCiphertext(
        c=(rp_add(basis, ct.c[0], d0), rp_add(basis, ct.c[1], d1)),
        params=params)


import jax as _jax  # noqa: E402

_relin_jit = _jax.jit(_relinearize_impl)


def relinearize(ct: BfvCiphertext, rlk) -> BfvCiphertext:
    """Degree-2 -> degree-1 using the relin key (reference keyswitch.rs:59-101)."""
    if len(ct.c) < 3:
        return ct
    if len(ct.c) > 3:
        raise NotImplementedYet("relinearization only supports degree-2 ciphertexts")
    if len(ct.params.moduli) == 1 and _config.jit_enabled():
        return _relin_jit(ct, rlk)  # device path: compiled once, cached
    return _relinearize_impl(ct, rlk)  # multi-prime / CPU: eager


def gadget_decompose(params: BfvParams, coeffs_host):
    """Host oracle: balanced digits of [0, q) ints, returns list of digit lists.

    Mirrors the reference's definition exactly (keyswitch.rs:11-52); used by
    tests to validate the device path's reconstruction identity.
    """
    q = params.moduli[0]
    B = params.gadget_base
    D = params.gadget_digits
    half_b = B // 2
    half_q = q // 2
    out = [[0] * len(coeffs_host) for _ in range(D)]
    for pos, c in enumerate(coeffs_host):
        rem = c - q if c > half_q else c
        for d in range(D):
            r = rem % B
            if r >= half_b:
                r -= B
            out[d][pos] = r % q
            rem = (rem - r) // B
    return out
