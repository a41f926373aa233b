"""Advanced dBFV ops: automorphisms, divide-by-base, change-of-base.

Reference: /root/reference/src/dbfv/advanced.rs.
"""

from __future__ import annotations

import numpy as np

from ..bfv.encoding import Plaintext
from ..bfv.eval import bfv_add, bfv_apply_automorphism, bfv_plain_mul, bfv_sub
from ..bfv.keygen import GaloisKey
from ..errors import InvalidParam
from ..params import DbfvParams
from ..ring import hostmath as hm
from ..bfv import BfvCiphertext
from ..ring.rns import RnsPoly
from .ciphertext import DbfvCiphertext
from .decomposition import digit_decompose

_U64 = 1 << 64


def dbfv_apply_automorphism(ct: DbfvCiphertext, gk: GaloisKey) -> DbfvCiphertext:
    """Apply sigma_k to every limb — one batched call (reference advanced.rs:15-29)."""
    return DbfvCiphertext(limbs=bfv_apply_automorphism(ct.limbs, gk),
                          degree=ct.degree, mul_depth=ct.mul_depth,
                          params=ct.params)


def _scalar_plain_mul(limbs: BfvCiphertext, scalar: int) -> BfvCiphertext:
    """Multiply by a scalar plaintext (constant polynomial; reference advanced.rs:162-171)."""
    params = limbs.params
    coeffs = np.zeros(params.ring_degree, dtype=np.uint64)
    coeffs[0] = scalar % params.plain_modulus
    return bfv_plain_mul(limbs, Plaintext(coeffs=coeffs, modulus=params.plain_modulus))


def _select_limb(limbs: BfvCiphertext, i: int) -> BfvCiphertext:
    polys = tuple(RnsPoly(lo=p.lo[..., i, :, :], hi=p.hi[..., i, :, :])
                  for p in limbs.c)
    return BfvCiphertext(c=polys, params=limbs.params)


def _stack_limbs(limb_list, params) -> BfvCiphertext:
    import jax.numpy as jnp

    ncomp = len(limb_list[0].c)
    polys = []
    for ci in range(ncomp):
        lo = jnp.stack([lb.c[ci].lo for lb in limb_list], axis=-3)
        hi = jnp.stack([lb.c[ci].hi for lb in limb_list], axis=-3)
        polys.append(RnsPoly(lo=lo, hi=hi))
    return BfvCiphertext(c=tuple(polys), params=params)


def _zero_like(limb: BfvCiphertext) -> BfvCiphertext:
    return bfv_sub(limb, limb)


def dbfv_div_by_base(ct: DbfvCiphertext) -> DbfvCiphertext:
    """phi_b map: divide plaintext and modulus by b (reference advanced.rs:36-93).

    c(B) = c0 + B*c~(B)  ->  c0*b^{-1} folded into limb 1, limbs shift down;
    requires b | p.
    """
    params = ct.params
    d = params.num_digits
    if d == 0:
        raise InvalidParam("empty dBFV ciphertext")
    base = params.base
    t = params.bfv_params.plain_modulus
    base_inv_t = hm.mod_inv(base % t, t)

    old_p = params.effective_plain_modulus
    if old_p % base != 0:
        raise InvalidParam(f"plaintext modulus {old_p} is not divisible by base {base}")
    new_p = old_p // base
    new_p_u64 = 0 if new_p == _U64 else new_p

    c0_div = _scalar_plain_mul(_select_limb(ct.limbs, 0), base_inv_t)
    zero = _zero_like(_select_limb(ct.limbs, d - 1))

    new_limbs = []
    if d >= 2:
        new_limbs.append(bfv_add(_select_limb(ct.limbs, 1), c0_div))
    else:
        new_limbs.append(c0_div)
    for i in range(1, d):
        new_limbs.append(_select_limb(ct.limbs, i + 1) if i + 1 < d else zero)

    new_params = DbfvParams.create(params.bfv_params, base, d, new_p_u64)
    return DbfvCiphertext(limbs=_stack_limbs(new_limbs, params.bfv_params),
                          degree=max(ct.degree - 1, 1), mul_depth=ct.mul_depth,
                          params=new_params)


def dbfv_change_base(ct: DbfvCiphertext, new_base: int,
                     new_num_digits: int) -> DbfvCiphertext:
    """Linear change of base b -> b' (reference advanced.rs:99-160).

    Column i of the transform is the base-b' decomposition of b^i mod p;
    new limb j = sum_i transform[j][i] * old limb i.
    """
    if new_base < 2:
        raise InvalidParam("new base must be >= 2")
    if new_num_digits < 1:
        raise InvalidParam("new_num_digits must be >= 1")
    params = ct.params
    old_d = params.num_digits
    p = params.effective_plain_modulus

    transform = [[0] * old_d for _ in range(new_num_digits)]
    b_pow = 1
    for i in range(old_d):
        digits = digit_decompose(b_pow % p, new_base, new_num_digits)
        for j in range(new_num_digits):
            transform[j][i] = digits[j]
        b_pow = (b_pow * params.base) % p

    zero = _zero_like(_select_limb(ct.limbs, 0))
    new_limbs = []
    for j in range(new_num_digits):
        acc = zero
        for i in range(old_d):
            coeff = transform[j][i]
            if coeff == 0:
                continue
            acc = bfv_add(acc, _scalar_plain_mul(_select_limb(ct.limbs, i), coeff))
        new_limbs.append(acc)

    new_params = DbfvParams.create(params.bfv_params, new_base, new_num_digits,
                                   params.plain_modulus)
    return DbfvCiphertext(limbs=_stack_limbs(new_limbs, params.bfv_params),
                          degree=new_num_digits, mul_depth=ct.mul_depth,
                          params=new_params)
