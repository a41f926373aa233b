"""Homomorphic evaluation: add/sub/neg, HPS multiply, automorphisms, traces.

Reference: /root/reference/src/bfv/eval.rs.  The HPS RNS multiply
(eval.rs:157-413) is redesigned for 32-bit lanes: the reference's i128 scalar
loops become branchless tensor kernels, and the round(p*a/q) term — i128
division there — is a 64x128 fixed-point multiply by phi = round(p*2^126/q)
whose error (< 2^-66) is strictly below the minimum distance of p*a/q from a
rounding boundary (1/(2q) > 2^-63 for q < 2^62), so rounding is provably
exact.  See SURVEY.md "hard parts" #1/#3.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..errors import InvalidParam, MissingKey
from .. import config as _config
from ..params import BfvParams
from ..ring import hostmath as hm
from ..ring import wordops as w
from ..ring.rns import (
    RnsPoly, from_coeff_residues, from_host_residues, rp_add, rp_automorphism,
    rp_monomial_mul, rp_mul, rp_neg, rp_sub, rp_zero, to_coeff_residues,
    to_u64_host, crt_to_ints_host,
)
from . import BfvCiphertext
from .encoding import Plaintext
from .encrypt import scale_plaintext
from .keygen import GaloisKey, RelinKey
from .keyswitch import gadget_digits_rns, keyswitch_inner_product, relinearize


# ---------------------------------------------------------------------------
# linear ops
# ---------------------------------------------------------------------------

def bfv_add(ct1: BfvCiphertext, ct2: BfvCiphertext) -> BfvCiphertext:
    """Component-wise add with degree-mismatch tolerance (reference eval.rs:14-31)."""
    basis = ct1.params.ct_basis
    n1, n2 = len(ct1.c), len(ct2.c)
    c = []
    for i in range(max(n1, n2)):
        if i < n1 and i < n2:
            c.append(rp_add(basis, ct1.c[i], ct2.c[i]))
        elif i < n1:
            c.append(ct1.c[i])
        else:
            c.append(ct2.c[i])
    return BfvCiphertext(c=tuple(c), params=ct1.params)


def bfv_sub(ct1: BfvCiphertext, ct2: BfvCiphertext) -> BfvCiphertext:
    """Component-wise subtract (reference eval.rs:34-51)."""
    basis = ct1.params.ct_basis
    n1, n2 = len(ct1.c), len(ct2.c)
    c = []
    for i in range(max(n1, n2)):
        if i < n1 and i < n2:
            c.append(rp_sub(basis, ct1.c[i], ct2.c[i]))
        elif i < n1:
            c.append(ct1.c[i])
        else:
            c.append(rp_neg(basis, ct2.c[i]))
    return BfvCiphertext(c=tuple(c), params=ct1.params)


def bfv_neg(ct: BfvCiphertext) -> BfvCiphertext:
    basis = ct.params.ct_basis
    return BfvCiphertext(c=tuple(rp_neg(basis, ci) for ci in ct.c), params=ct.params)


# ---------------------------------------------------------------------------
# multiplication
# ---------------------------------------------------------------------------

def bfv_mul_and_relin(ct1: BfvCiphertext, ct2: BfvCiphertext,
                      rlk: RelinKey) -> BfvCiphertext:
    """Tensor multiply then relinearize (reference eval.rs:73-82)."""
    return relinearize(bfv_mul_no_relin(ct1, ct2), rlk)


def bfv_mul_no_relin(ct1: BfvCiphertext, ct2: BfvCiphertext) -> BfvCiphertext:
    """Degree-1 x degree-1 -> degree-2 tensor product scaled by p/Q.

    Dispatch mirrors the reference (eval.rs:89-108): single-prime Q with an
    auxiliary basis takes the device HPS path; anything else falls back to
    the exact host BigInt path (the reference's multi-prime/schoolbook
    routes, eval.rs:110-147 and 416-454, unified — exact for all params).
    """
    if len(ct1.c) != 2 or len(ct2.c) != 2:
        raise InvalidParam("multiplication requires degree-1 ciphertexts")
    params = ct1.params
    if len(params.moduli) == 1 and params.aux_basis is not None:
        if _config.jit_enabled():
            return _hps_jit(ct1, ct2)
        return _bfv_mul_hps(ct1, ct2)
    return _bfv_mul_host_exact(ct1, ct2)


@lru_cache(maxsize=None)
def _hps_consts(moduli: tuple, aux_moduli: tuple, p: int, n: int):
    """Host-side integer constants for the HPS scale (cached per params)."""
    q = moduli[0]
    La = len(aux_moduli)
    if La not in (1, 2):
        raise InvalidParam(f"HPS scaling supports 1 or 2 aux primes, got {La}")
    big_p = 1
    for m in aux_moduli:
        big_p *= m
    if La == 1 and big_p <= n * q // 2:
        raise InvalidParam(
            f"single aux prime too small for HPS centering: P={big_p} <= n*Q/2={n * q // 2}")
    R = 1 << 64
    c = {
        "q": q,
        "big_p": big_p,
        "half_p": big_p // 2,
        "p_mod_q": big_p % q,
        "phi": (p << 126) // q + (1 if ((p << 126) % q) * 2 >= q else 0),
        "p_mont_q": p % q * R % q,
        # q^{-1} mod p_j, premultiplied by R so mont_mul gives standard form
        "qinv_mont_pj": tuple(hm.mod_inv(q % m, m) * R % m for m in aux_moduli),
    }
    if La == 2:
        p0, p1 = aux_moduli
        c["c0_mont"] = hm.mod_inv(p1 % p0, p0) * R % p0  # p1^{-1} mod p0
        c["c1_mont"] = hm.mod_inv(p0 % p1, p1) * R % p1  # p0^{-1} mod p1
    return c


def _base_extend_centered(params: BfvParams, poly: RnsPoly) -> RnsPoly:
    """Centered base extension Z_q -> aux primes (reference eval.rs:217-247)."""
    ctb, auxb = params.ct_basis, params.aux_basis
    q_int = params.moduli[0]
    res = to_coeff_residues(ctb, poly)
    a = (res[0][..., 0, :], res[1][..., 0, :])  # [..., n]
    half_q = w.const_pair(q_int // 2)
    q = w.const_pair(q_int)
    neg = w.gt64(a, half_q)
    mag = w.select64(neg, w.sub64(q, a), a)
    magb = (mag[0][..., None, :], mag[1][..., None, :])  # add aux-L axis
    red = w.mod_from_u64(magb, auxb.bq(1), auxb.bqinv(1), auxb.br1(1))
    negred = w.mod_neg64(red, auxb.bq(1))
    out = w.select64(neg[..., None, :], negred, red)
    return from_coeff_residues(auxb, out)


def _hps_scale(params: BfvParams, t_q: RnsPoly, t_p: RnsPoly) -> RnsPoly:
    """round(p * t / q) mod q from residues (t mod q, t mod P).

    Redesign of reference eval.rs:257-413 (see module docstring).
    """
    ctb, auxb = params.ct_basis, params.aux_basis
    cst = _hps_consts(params.moduli, params.aux_moduli, params.plain_modulus,
                      params.ring_degree)
    q_int = cst["q"]
    La = len(params.aux_moduli)

    a_res = to_coeff_residues(ctb, t_q)
    a = (a_res[0][..., 0, :], a_res[1][..., 0, :])       # [..., n] mod q
    b = to_coeff_residues(auxb, t_p)                     # [..., La, n]

    q = w.const_pair(q_int)
    half_q = w.const_pair(q_int // 2)
    neg_a = w.gt64(a, half_q)
    mag = w.select64(neg_a, w.sub64(q, a), a)            # |centered a| <= q/2

    # --- m_j = (b_j - a_ext_j) * q^{-1} mod p_j ---
    magb = (mag[0][..., None, :], mag[1][..., None, :])
    magred = w.mod_from_u64(magb, auxb.bq(1), auxb.bqinv(1), auxb.br1(1))
    a_ext = w.select64(neg_a[..., None, :], w.mod_neg64(magred, auxb.bq(1)), magred)
    diff = w.mod_sub64(b, a_ext, auxb.bq(1))
    qi_lo, qi_hi = w.to_pair_np(np.array(cst["qinv_mont_pj"], dtype=np.uint64))
    qinv_mont = (jnp.asarray(qi_lo)[:, None], jnp.asarray(qi_hi)[:, None])
    # qinv_mont_pj = q^{-1} * R mod p_j, so mont_mul yields standard form
    m_j = w.mont_mul(diff, qinv_mont, auxb.bq(1), auxb.bqinv(1))  # [..., La, n]

    # --- reconstruct m over P (centered) and reduce mod q ---
    qpair = w.const_pair(q_int)
    qc = (w.const_pair(q_int), w.const_pair(hm.montgomery_inv_neg(q_int)),
          w.const_pair(hm.mont_r1(q_int)), w.const_pair(hm.mont_r2(q_int)))
    if La == 1:
        p0 = params.aux_moduli[0]
        m0 = (m_j[0][..., 0, :], m_j[1][..., 0, :])
        zero = jnp.zeros_like(m0[0])
        m128 = (m0[0], m0[1], zero, zero)
    else:
        p0, p1 = params.aux_moduli
        m0 = (m_j[0][..., 0, :], m_j[1][..., 0, :])
        m1 = (m_j[0][..., 1, :], m_j[1][..., 1, :])
        p0b = (auxb.q[0][0], auxb.q[1][0])
        p1b = (auxb.q[0][1], auxb.q[1][1])
        p0inv = (auxb.qinv[0][0], auxb.qinv[1][0])
        p1inv = (auxb.qinv[0][1], auxb.qinv[1][1])
        t0 = w.mont_mul(m0, w.const_pair(cst["c0_mont"]), p0b, p0inv)
        t1 = w.mont_mul(m1, w.const_pair(cst["c1_mont"]), p1b, p1inv)
        m128 = w.add128(w.mul64(t0, w.const_pair(p1)), w.mul64(t1, w.const_pair(p0)))
    big_p_words = tuple(jnp.uint32((cst["big_p"] >> (32 * i)) & 0xFFFFFFFF)
                        for i in range(4))
    half_p_words = tuple(jnp.uint32((cst["half_p"] >> (32 * i)) & 0xFFFFFFFF)
                         for i in range(4))
    over = w.ge128(m128, big_p_words)
    m128 = w.select128(over, w.sub128(m128, big_p_words), m128)
    neg_m = jnp.logical_not(w.ge128(half_p_words, m128))  # m > P/2
    m_mod_q = w.mod_from_u128(m128, *qc)
    p_mod_q = w.const_pair(cst["p_mod_q"])
    m_mod_q = w.select64(neg_m, w.mod_sub64(m_mod_q, p_mod_q, qpair), m_mod_q)

    # --- round term r = round(p * mag / q) via fixed-point phi ---
    phi_words = tuple(jnp.uint32((cst["phi"] >> (32 * i)) & 0xFFFFFFFF)
                      for i in range(4))
    prod = w.mul64x128(mag, phi_words)  # 6 words
    # add 2^125 (rounding), then take bits [126:190)
    w3 = prod[3] + jnp.uint32(1 << 29)
    c3 = (w3 < prod[3]).astype(jnp.uint32)
    w4 = prod[4] + c3
    c4 = (w4 < prod[4]).astype(jnp.uint32)
    w5 = prod[5] + c4
    r = ((w3 >> 30) | (w4 << 2), (w4 >> 30) | (w5 << 2))  # < p <= q
    r_signed = w.select64(neg_a, w.mod_neg64(r, qpair), r)

    # --- result = r_signed + p * m (mod q) ---
    pm = w.mont_mul(m_mod_q, w.const_pair(cst["p_mont_q"]), qc[0], qc[1])
    out = w.mod_add64(r_signed, pm, qpair)
    out = (out[0][..., None, :], out[1][..., None, :])  # restore L=1 axis
    return from_coeff_residues(ctb, out)


def _bfv_mul_hps(ct1: BfvCiphertext, ct2: BfvCiphertext) -> BfvCiphertext:
    """HPS RNS multiply (reference eval.rs:157-209), fully on device."""
    params = ct1.params
    ctb = params.ct_basis
    c0p = _base_extend_centered(params, ct1.c[0])
    c1p = _base_extend_centered(params, ct1.c[1])
    d0p = _base_extend_centered(params, ct2.c[0])
    d1p = _base_extend_centered(params, ct2.c[1])

    auxb = params.aux_basis
    t0_q = rp_mul(ctb, ct1.c[0], ct2.c[0])
    t1_q = rp_add(ctb, rp_mul(ctb, ct1.c[0], ct2.c[1]),
                  rp_mul(ctb, ct1.c[1], ct2.c[0]))
    t2_q = rp_mul(ctb, ct1.c[1], ct2.c[1])
    t0_p = rp_mul(auxb, c0p, d0p)
    t1_p = rp_add(auxb, rp_mul(auxb, c0p, d1p), rp_mul(auxb, c1p, d0p))
    t2_p = rp_mul(auxb, c1p, d1p)

    r0 = _hps_scale(params, t0_q, t0_p)
    r1 = _hps_scale(params, t1_q, t1_p)
    r2 = _hps_scale(params, t2_q, t2_p)
    return BfvCiphertext(c=(r0, r1, r2), params=params)


# cached-jit entry for the fully-traceable HPS path: eager callers (tests,
# notebooks) get compiled-once execution; inside an outer jit this inlines
import jax as _jax  # noqa: E402

_hps_jit = _jax.jit(_bfv_mul_hps)


def _bfv_mul_host_exact(ct1: BfvCiphertext, ct2: BfvCiphertext) -> BfvCiphertext:
    """Exact host BigInt tensor multiply — correctness fallback.

    Covers the reference's multi-prime BigInt path (eval.rs:110-147) and the
    schoolbook path (eval.rs:416-454) with one exact algorithm; O(n^2) host
    work, intended for small test parameters only.
    """
    params = ct1.params
    basis = params.ct_basis
    n = params.ring_degree
    p = params.plain_modulus
    big_q = params.big_q
    half_q = big_q >> 1

    def centered_ints(poly):
        res = to_u64_host(basis, poly)
        xs = crt_to_ints_host(basis, res)
        flat = xs.reshape(-1, n)
        return [[int(v) - big_q if int(v) > half_q else int(v) for v in row]
                for row in flat], xs.shape[:-1]

    (c0_list, bshape), (c1_list, _) = centered_ints(ct1.c[0]), centered_ints(ct1.c[1])
    (d0_list, _), (d1_list, _) = centered_ints(ct2.c[0]), centered_ints(ct2.c[1])

    def mul_poly(a, b):
        # exact negacyclic convolution over Z (no modulus)
        out = [0] * n
        for i, ai in enumerate(a):
            if ai == 0:
                continue
            for j, bj in enumerate(b):
                if bj == 0:
                    continue
                k = i + j
                if k < n:
                    out[k] += ai * bj
                else:
                    out[k - n] -= ai * bj
        return out

    def scale(t):
        out = []
        for x in t:
            num = p * x
            r = (num + half_q) // big_q if num >= 0 else -((-num + half_q) // big_q)
            out.append(r % big_q)
        return out

    comps = []
    for b in range(len(c0_list)):
        t0 = scale(mul_poly(c0_list[b], d0_list[b]))
        t1 = scale([x + y for x, y in zip(mul_poly(c0_list[b], d1_list[b]),
                                          mul_poly(c1_list[b], d0_list[b]))])
        t2 = scale(mul_poly(c1_list[b], d1_list[b]))
        comps.append((t0, t1, t2))

    polys = []
    for comp_idx in range(3):
        res = np.zeros((len(comps), basis.num_moduli, n), dtype=np.uint64)
        for b, comp in enumerate(comps):
            for li, m in enumerate(basis.moduli):
                res[b, li] = np.array([v % m for v in comp[comp_idx]], dtype=np.uint64)
        res = res.reshape(tuple(bshape) + (basis.num_moduli, n))
        polys.append(from_host_residues(basis, res))
    return BfvCiphertext(c=tuple(polys), params=params)


# ---------------------------------------------------------------------------
# plaintext ops
# ---------------------------------------------------------------------------

@_jax.jit
def _plain_pair_to_rns(pair, basis) -> RnsPoly:
    p = (pair[0][..., None, :], pair[1][..., None, :])
    red = w.mod_from_u64(p, basis.bq(1), basis.bqinv(1), basis.br1(1))
    return from_coeff_residues(basis, red)


def _plain_to_rns(params: BfvParams, plaintext: Plaintext) -> RnsPoly:
    coeffs = np.asarray(plaintext.coeffs, dtype=np.uint64)
    lo, hi = w.to_pair_np(coeffs)
    fn = _plain_pair_to_rns if _config.jit_enabled() else _plain_pair_to_rns.__wrapped__
    return fn((jnp.asarray(lo), jnp.asarray(hi)), params.ct_basis)


def bfv_plain_mul(ct: BfvCiphertext, plaintext: Plaintext) -> BfvCiphertext:
    """ct * raw plaintext polynomial (no Delta; reference eval.rs:468-486)."""
    pt = _plain_to_rns(ct.params, plaintext)
    basis = ct.params.ct_basis
    return BfvCiphertext(c=tuple(rp_mul(basis, ci, pt) for ci in ct.c),
                         params=ct.params)


def bfv_plain_add(ct: BfvCiphertext, plaintext: Plaintext) -> BfvCiphertext:
    """ct + Delta*m (reference eval.rs:489-503)."""
    delta_m = scale_plaintext(plaintext, ct.params)
    basis = ct.params.ct_basis
    return BfvCiphertext(c=(rp_add(basis, ct.c[0], delta_m),) + tuple(ct.c[1:]),
                         params=ct.params)


# ---------------------------------------------------------------------------
# automorphisms / rotations
# ---------------------------------------------------------------------------

def _apply_automorphism_impl(ct: BfvCiphertext, gk: GaloisKey) -> BfvCiphertext:
    params = ct.params
    basis = params.ct_basis
    c0a = rp_automorphism(basis, ct.c[0], gk.element)
    c1a = rp_automorphism(basis, ct.c[1], gk.element)
    digits = gadget_digits_rns(params, c1a)
    d0, d1 = keyswitch_inner_product(basis, digits, gk.ks0, gk.ks1)
    return BfvCiphertext(c=(rp_add(basis, c0a, d0), d1), params=params)


_auto_jit = _jax.jit(_apply_automorphism_impl)


def bfv_apply_automorphism(ct: BfvCiphertext, gk: GaloisKey) -> BfvCiphertext:
    """sigma_k then key-switch back to s (reference eval.rs:512-561).

    The permutation itself is an eval-domain gather (no NTTs); only the
    key-switch pays INTT + digit decomposition.
    """
    if len(ct.c) != 2:
        raise InvalidParam("automorphism requires degree-1 ciphertext")
    if len(ct.params.moduli) == 1 and _config.jit_enabled():
        return _auto_jit(ct, gk)
    return _apply_automorphism_impl(ct, gk)


def bfv_trace(ct: BfvCiphertext, galois_elements, galois_keys: dict) -> BfvCiphertext:
    """Iterated partial trace: ct <- ct + sigma_k(ct) over elements
    (reference eval.rs:573-587)."""
    result = ct
    for k in galois_elements:
        if k not in galois_keys:
            raise MissingKey(f"missing Galois key for element {k}")
        rotated = bfv_apply_automorphism(result, galois_keys[k])
        result = bfv_add(result, rotated)
    return result


def bfv_inner_product(cts, pts) -> BfvCiphertext:
    """sum_i pt_i * ct_i (reference eval.rs:593-606)."""
    if not cts or len(cts) != len(pts):
        raise InvalidParam("mismatched ct/pt lengths")
    acc = bfv_plain_mul(cts[0], pts[0])
    for ct, pt in zip(cts[1:], pts[1:]):
        acc = bfv_add(acc, bfv_plain_mul(ct, pt))
    return acc


def bfv_monomial_mul(ct: BfvCiphertext, j) -> BfvCiphertext:
    """Multiply by X^j — pure eval-domain pointwise op (reference eval.rs:613-652)."""
    basis = ct.params.ct_basis
    jj = j % (2 * ct.params.ring_degree) if isinstance(j, int) else j
    return BfvCiphertext(c=tuple(rp_monomial_mul(basis, ci, jj) for ci in ct.c),
                         params=ct.params)
