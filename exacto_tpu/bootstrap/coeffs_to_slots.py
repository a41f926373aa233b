"""CoeffsToSlots / SlotsToCoeffs: homomorphic coefficient extraction.

Reference: /root/reference/src/bootstrap/coeffs_to_slots.rs.  TPU-native
redesign: the reference extracts the n coefficients one at a time, each with
its own log(n) trace chain — O(n log n) sequential keyswitches
(coeffs_to_slots.rs:104-117, the dominant bootstrap cost).  Here all n
extractions run as ONE batched ciphertext with a leading slot axis: a single
batched monomial shift (X^{-j} for all j simultaneously, using the
eval-domain psi-power gather) followed by log(n) BATCHED trace steps — the
same total work, but log(n) fused kernels instead of n*log(n) sequential ops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..bfv import BfvCiphertext
from ..bfv.encoding import Plaintext
from ..bfv.eval import bfv_add, bfv_apply_automorphism, bfv_plain_mul
from ..bfv.keygen import SecretKey, gen_galois_key
from ..errors import InvalidParam, MissingKey
from ..ring import hostmath as hm
from ..ring.rns import RnsPoly, rp_monomial_mul, rp_sum_leading_axis


def required_trace_elements(n: int) -> list[int]:
    """Galois elements for the trace (reference coeffs_to_slots.rs:169-183).

    n <= 32: all odd non-identity elements (naive sum); larger power-of-two
    n: the minimal relative-trace chain {n+1, n/2+1, ..., 3}.
    """
    if n <= 32 or (n & (n - 1)):
        return list(range(3, 2 * n, 2))
    elems = []
    step = n
    while step >= 2:
        elems.append(step + 1)
        step >>= 1
    return elems


def gen_trace_galois_keys(key, sk: SecretKey) -> dict:
    """Minimal key set for trace-based extraction (reference :186-197)."""
    import jax

    keys = {}
    for e in required_trace_elements(sk.params.ring_degree):
        key, ke = jax.random.split(key)
        keys[e] = gen_galois_key(ke, sk, e)
    return keys


def gen_all_galois_keys(key, sk: SecretKey) -> dict:
    """Keys for every odd element in [3, 2n) (reference :150-163)."""
    import jax

    keys = {}
    for e in range(3, 2 * sk.params.ring_degree, 2):
        key, ke = jax.random.split(key)
        keys[e] = gen_galois_key(ke, sk, e)
    return keys


def _trace(ct: BfvCiphertext, galois_keys: dict) -> BfvCiphertext:
    """Tr(ct) = sum over the full Galois group; works on batched cts
    (reference :55-96)."""
    n = ct.params.ring_degree
    result = ct
    if n <= 32 or (n & (n - 1)):
        # naive: sum sigma_k(ct) over all odd k
        for k in range(3, 2 * n, 2):
            if k not in galois_keys:
                raise MissingKey(f"missing Galois key for element {k}")
            result = bfv_add(result, bfv_apply_automorphism(ct, galois_keys[k]))
        return result
    for k in required_trace_elements(n):
        if k not in galois_keys:
            raise MissingKey(f"missing Galois key for element {k}")
        result = bfv_add(result, bfv_apply_automorphism(result, galois_keys[k]))
    return result


def _scale_by_n_inv(ct: BfvCiphertext) -> BfvCiphertext:
    params = ct.params
    n, t = params.ring_degree, params.plain_modulus
    n_inv = hm.mod_inv(n % t, t)
    coeffs = np.zeros(n, dtype=np.uint64)
    coeffs[0] = n_inv
    return bfv_plain_mul(ct, Plaintext(coeffs=coeffs, modulus=t))


def extract_coefficient(ct: BfvCiphertext, j: int, galois_keys: dict) -> BfvCiphertext:
    """Extract coefficient j as a scalar ciphertext (reference :21-49)."""
    n = ct.params.ring_degree
    shifted = ct if j == 0 else _monomial_shift(ct, jnp.asarray((2 * n - j) % (2 * n)))
    return _scale_by_n_inv(_trace(shifted, galois_keys))


def _monomial_shift(ct: BfvCiphertext, j) -> BfvCiphertext:
    basis = ct.params.ct_basis
    return BfvCiphertext(c=tuple(rp_monomial_mul(basis, ci, j) for ci in ct.c),
                         params=ct.params)


def coeffs_to_slots(ct: BfvCiphertext, galois_keys: dict) -> BfvCiphertext:
    """ALL-coefficient extraction, batched: returns a ciphertext with leading
    slot axis [n], slot j encrypting coefficient j (reference :104-117 loops).
    """
    n = ct.params.ring_degree
    shifts = jnp.asarray(np.array([(2 * n - j) % (2 * n) for j in range(n)],
                                  dtype=np.int32))
    batched = _monomial_shift(ct, shifts)   # leading axis [n]
    return _scale_by_n_inv(_trace(batched, galois_keys))


def slots_to_coeffs(slots: BfvCiphertext) -> BfvCiphertext:
    """Pack a slot-batched ciphertext back: result = sum_j X^j * ct_j
    (reference :123-144).  `slots` carries the slot axis leading."""
    params = slots.params
    n = params.ring_degree
    if slots.c[0].lo.shape[0] != n:
        raise InvalidParam(f"expected {n} slots, got {slots.c[0].lo.shape[0]}")
    shifts = jnp.asarray(np.arange(n, dtype=np.int32))
    # X^j applied slot-wise: rp_monomial_mul with matching batch axis
    basis = params.ct_basis
    polys = []
    for ci in slots.c:
        shifted = _slotwise_monomial(basis, ci, shifts)
        polys.append(rp_sum_leading_axis(basis, shifted))
    return BfvCiphertext(c=tuple(polys), params=params)


def _slotwise_monomial(basis, poly: RnsPoly, shifts) -> RnsPoly:
    """Multiply slot b by X^{shifts[b]} (shifts aligned with leading axis)."""
    from ..ring import wordops as w
    from ..ring.ntt import eval_exponents

    n = basis.ring_degree
    e = jnp.asarray(np.array(eval_exponents(n), dtype=np.int32))
    idx = (shifts[:, None] * e) % (2 * n)  # [n_slots, n]
    s_lo = jnp.moveaxis(jnp.take(basis.psi_pows[0], idx, axis=1), 0, -2)
    s_hi = jnp.moveaxis(jnp.take(basis.psi_pows[1], idx, axis=1), 0, -2)
    # align the slot axis with the poly's leading axis; keep any inner batch
    # dims (e.g. the dBFV limb axis) broadcasting via singletons
    extra = poly.lo.ndim - 3
    shape = (s_lo.shape[0],) + (1,) * extra + s_lo.shape[-2:]
    s_lo = s_lo.reshape(shape)
    s_hi = s_hi.reshape(shape)
    lo, hi = w.mont_mul(poly.pair, (s_lo, s_hi), basis.bq(1), basis.bqinv(1))
    return RnsPoly(lo=lo, hi=hi)
