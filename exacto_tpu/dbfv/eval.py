"""dBFV homomorphic evaluation: add/sub/neg and the d^2 digit-convolution mul.

Reference: /root/reference/src/dbfv/eval.rs.  The centerpiece `dbfv_mul`
replaces the reference's rayon fan-out of d^2 sequential BFV multiplies
(eval.rs:104-122) with ONE broadcast-batched BFV multiply over a [d, d]
limb-pair grid — all d^2 HPS multiplies, relinearizations and NTTs fuse into
a single batched tensor program, which is exactly the shape TPUs want.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import config as _config
from ..bfv import BfvCiphertext
from ..bfv.eval import bfv_add, bfv_mul_and_relin, bfv_neg, bfv_sub
from ..bfv.keygen import RelinKey
from ..errors import DimensionMismatch, InvalidParam, NotImplementedYet
from ..ring import wordops as w
from ..ring.rns import RnsPoly
from .ciphertext import DbfvCiphertext
from . import reduction


def _limbwise(op, ct1: DbfvCiphertext, ct2: DbfvCiphertext) -> DbfvCiphertext:
    if ct1.num_limbs != ct2.num_limbs:
        raise DimensionMismatch(ct1.num_limbs, ct2.num_limbs)
    limbs = op(ct1.limbs, ct2.limbs)
    return DbfvCiphertext(limbs=limbs,
                          degree=max(ct1.degree, ct2.degree),
                          mul_depth=max(ct1.mul_depth, ct2.mul_depth),
                          params=ct1.params)


def dbfv_add(ct1: DbfvCiphertext, ct2: DbfvCiphertext) -> DbfvCiphertext:
    """Limb-wise add (reference eval.rs:11-33)."""
    return _limbwise(bfv_add, ct1, ct2)


def dbfv_sub(ct1: DbfvCiphertext, ct2: DbfvCiphertext) -> DbfvCiphertext:
    """Limb-wise subtract (reference eval.rs:36-58)."""
    return _limbwise(bfv_sub, ct1, ct2)


def dbfv_neg(ct: DbfvCiphertext) -> DbfvCiphertext:
    """Limb-wise negate (reference eval.rs:61-71)."""
    return DbfvCiphertext(limbs=bfv_neg(ct.limbs), degree=ct.degree,
                          mul_depth=ct.mul_depth, params=ct.params)


def _broadcast_limb_grid(ct1: DbfvCiphertext, ct2: DbfvCiphertext):
    """Expand limb axes to a [d, d] grid: A[i,j] = limb1_i, B[i,j] = limb2_j."""
    d = ct1.num_limbs

    def expand(ct: BfvCiphertext, axis: int) -> BfvCiphertext:
        polys = []
        for poly in ct.c:
            # limb axis currently at -3; insert grid axis before or after it
            if axis == 0:  # [.., d, 1, L, n]
                lo = poly.lo[..., :, None, :, :]
                hi = poly.hi[..., :, None, :, :]
            else:          # [.., 1, d, L, n]
                lo = poly.lo[..., None, :, :, :]
                hi = poly.hi[..., None, :, :, :]
            shape = lo.shape[:-4] + (d, d) + lo.shape[-2:]
            polys.append(RnsPoly(lo=jnp.broadcast_to(lo, shape),
                                 hi=jnp.broadcast_to(hi, shape)))
        return BfvCiphertext(c=tuple(polys), params=ct.params)

    return expand(ct1.limbs, 0), expand(ct2.limbs, 1)


def dbfv_mul(ct1: DbfvCiphertext, ct2: DbfvCiphertext,
             rlk: RelinKey) -> DbfvCiphertext:
    """Degree-d digit convolution: result_k = sum_{i+j=k} BfvMul(limb_i, limb_j).

    Reference eval.rs:82-148.  Depth guard matches the reference contract:
    chained multiplication without bootstrap is rejected (chaining goes
    through dbfv_mul_then_bootstrap).
    """
    params = ct1.params
    d = params.num_digits
    if ct1.num_limbs != d or ct2.num_limbs != d:
        raise InvalidParam("multiplication requires d-limb ciphertexts")
    next_depth = max(ct1.mul_depth, ct2.mul_depth) + 1
    if next_depth > 1:
        raise NotImplementedYet(
            "chained dBFV multiplication requires ciphertext-level lattice "
            "reduction (paper 4.6.2); use dbfv_mul_then_bootstrap")
    bp = params.bfv_params
    hps_ok = len(bp.moduli) == 1 and bp.aux_basis is not None
    if hps_ok and _fast_path_ok(params):
        fn = _dbfv_mul_fast_jit if _config.jit_enabled() else _dbfv_mul_fast
        return fn(ct1, ct2, rlk)
    if hps_ok and _config.jit_enabled():
        return _dbfv_mul_jit(ct1, ct2, rlk)  # fully traceable: cached jit
    return _dbfv_mul_impl(ct1, ct2, rlk)


def _fast_path_ok(params) -> bool:
    """Deferred-sum HPS needs P > d*n*q/2 so the summed tensor's overflow
    multiple still CRT-recovers over the aux basis."""
    bp = params.bfv_params
    big_p = 1
    for m in bp.aux_moduli:
        big_p *= m
    return big_p > params.num_digits * bp.ring_degree * bp.moduli[0] // 2


def _dbfv_mul_impl(ct1: DbfvCiphertext, ct2: DbfvCiphertext,
                   rlk: RelinKey) -> DbfvCiphertext:
    params = ct1.params
    d = params.num_digits
    next_depth = max(ct1.mul_depth, ct2.mul_depth) + 1

    # one batched BFV multiply over the [d, d] limb grid
    A, B = _broadcast_limb_grid(ct1, ct2)
    prod = bfv_mul_and_relin(A, B, rlk)  # components shaped [.., d, d, L, n]

    # anti-diagonal sums: limb_k = sum_{i+j=k} prod[i, j]  (2d-1 limbs)
    basis = params.bfv_params.ct_basis
    q = basis.bq(1)
    out_polys = []
    for poly in prod.c:
        acc_lo, acc_hi = [], []
        for k in range(2 * d - 1):
            pairs = [(i, k - i) for i in range(max(0, k - d + 1), min(d, k + 1))]
            acc = (poly.lo[..., pairs[0][0], pairs[0][1], :, :],
                   poly.hi[..., pairs[0][0], pairs[0][1], :, :])
            for (i, j) in pairs[1:]:
                acc = w.mod_add64(acc, (poly.lo[..., i, j, :, :],
                                        poly.hi[..., i, j, :, :]), q)
            acc_lo.append(acc[0])
            acc_hi.append(acc[1])
        out_polys.append(RnsPoly(lo=jnp.stack(acc_lo, axis=-3),
                                 hi=jnp.stack(acc_hi, axis=-3)))

    widened = DbfvCiphertext(
        limbs=BfvCiphertext(c=tuple(out_polys), params=params.bfv_params),
        degree=2 * d - 1, mul_depth=next_depth, params=params)

    return reduction.reduce(widened, rlk)


def _grid_products(basis, c1_polys, c2_polys, d):
    """Anti-diagonal-summed tensor products over the limb grid.

    c1_polys/c2_polys: (comp0, comp1) RnsPoly with limb axis at -3.
    Returns (t0, t1, t2) RnsPoly with a [2d-1] limb axis at -3, where
    t_c[k] = sum_{i+j=k} of the degree-c tensor component of limb pair (i,j).
    """
    q = basis.bq(1)

    def pair_grid(a, b):
        # a[i] * b[j] pointwise products on the [d, d] grid
        alo = a.lo[..., :, None, :, :]
        ahi = a.hi[..., :, None, :, :]
        blo = b.lo[..., None, :, :, :]
        bhi = b.hi[..., None, :, :, :]
        return w.mont_mul((alo, ahi), (blo, bhi), basis.bq(1), basis.bqinv(1))

    def antidiag(grid_pair):
        lo, hi = grid_pair
        acc_lo, acc_hi = [], []
        for k in range(2 * d - 1):
            pairs = [(i, k - i) for i in range(max(0, k - d + 1), min(d, k + 1))]
            acc = (lo[..., pairs[0][0], pairs[0][1], :, :],
                   hi[..., pairs[0][0], pairs[0][1], :, :])
            for (i, j) in pairs[1:]:
                acc = w.mod_add64(acc, (lo[..., i, j, :, :],
                                        hi[..., i, j, :, :]), q)
            acc_lo.append(acc[0])
            acc_hi.append(acc[1])
        return RnsPoly(lo=jnp.stack(acc_lo, axis=-3),
                       hi=jnp.stack(acc_hi, axis=-3))

    a0, a1 = c1_polys
    b0, b1 = c2_polys
    t0 = antidiag(pair_grid(a0, b0))
    g01 = pair_grid(a0, b1)
    g10 = pair_grid(a1, b0)
    t1 = antidiag(w.mod_add64(g01, g10, basis.bq(1)))
    t2 = antidiag(pair_grid(a1, b1))
    return t0, t1, t2


def _dbfv_mul_fast(ct1: DbfvCiphertext, ct2: DbfvCiphertext,
                   rlk: RelinKey) -> DbfvCiphertext:
    """Digit-convolution multiply with per-limb base extension and DEFERRED
    HPS scaling + relinearization.

    The reference (and _dbfv_mul_impl) run a full BFV multiply per limb pair:
    d^2 base extensions, d^2 HPS scalings, d^2 relinearizations
    (dbfv/eval.rs:104-148).  Base extension is per-limb (d each side), and
    both the p/q scaling and the key-switch are linear in the tensor, so they
    commute with the anti-diagonal summation: this path extends 2d limbs,
    sums the degree-2 tensors per output index in BOTH bases, then scales and
    relinearizes only the 2d-1 output limbs — ~6x fewer NTTs for d=8.
    Noise: one rounding per output limb instead of a sum of d roundings
    (strictly better); requires P > d*n*q/2 (checked by _fast_path_ok).
    """
    from ..bfv.eval import _base_extend_centered, _hps_scale
    from ..bfv.keyswitch import relinearize

    params = ct1.params
    bp = params.bfv_params
    d = params.num_digits
    next_depth = max(ct1.mul_depth, ct2.mul_depth) + 1

    c10, c11 = ct1.limbs.c
    c20, c21 = ct2.limbs.c
    e10 = _base_extend_centered(bp, c10)
    e11 = _base_extend_centered(bp, c11)
    e20 = _base_extend_centered(bp, c20)
    e21 = _base_extend_centered(bp, c21)

    tq = _grid_products(bp.ct_basis, (c10, c11), (c20, c21), d)
    tp = _grid_products(bp.aux_basis, (e10, e11), (e20, e21), d)

    r = tuple(_hps_scale(bp, tq[c], tp[c]) for c in range(3))
    widened = BfvCiphertext(c=r, params=bp)
    relined = relinearize(widened, rlk)

    out = DbfvCiphertext(limbs=relined, degree=2 * d - 1,
                         mul_depth=next_depth, params=params)
    return reduction.reduce(out, rlk)


import jax as _jax  # noqa: E402

_dbfv_mul_jit = _jax.jit(_dbfv_mul_impl)
_dbfv_mul_fast_jit = _jax.jit(_dbfv_mul_fast)
