"""Degree reduction: fold limbs j >= d back via small representatives of B^j.

Reference: /root/reference/src/dbfv/reduction.rs.  Uses
SmallReps.compute_simple (raw digit decomposition of b^j mod p) exactly like
the reference runtime path; correctness of oversized digits is recovered at
decrypt via signed recomposition.  The fold is a tiny static linear map over
the limb axis, fully fused on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..bfv import BfvCiphertext
from ..ring import wordops as w
from ..ring.rns import RnsPoly
from .ciphertext import DbfvCiphertext
from .lattice import SmallReps


def reduce(ct: DbfvCiphertext, _rlk=None) -> DbfvCiphertext:
    """Fold excess limbs: result_i += rep_j[i] * limb_j for j >= d
    (reference reduction.rs:15-60)."""
    params = ct.params
    d = params.num_digits
    if ct.degree <= d:
        return ct

    reps = SmallReps.compute_simple(params.base, d, params.plain_modulus).reps
    basis = params.bfv_params.ct_basis
    q = basis.bq(1)
    qinv = basis.bqinv(1)

    out_polys = []
    for poly in ct.limbs.c:
        # keep first d limbs
        acc = [(poly.lo[..., i, :, :], poly.hi[..., i, :, :]) for i in range(d)]
        for j in range(d, ct.degree):
            rep = reps[j - d]
            limb = (poly.lo[..., j, :, :], poly.hi[..., j, :, :])
            for i in range(d):
                coeff = rep[i]
                if coeff == 0:
                    continue
                s = basis.mont_scalar_pair(int(coeff))
                scaled = w.mont_mul(limb, (s[0][:, None], s[1][:, None]), q, qinv)
                acc[i] = w.mod_add64(acc[i], scaled, q)
        out_polys.append(RnsPoly(lo=jnp.stack([a[0] for a in acc], axis=-3),
                                 hi=jnp.stack([a[1] for a in acc], axis=-3)))

    return DbfvCiphertext(
        limbs=BfvCiphertext(c=tuple(out_polys), params=params.bfv_params),
        degree=d, mul_depth=ct.mul_depth, params=params)
