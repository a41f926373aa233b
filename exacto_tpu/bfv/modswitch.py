"""Modulus switching: drop the last RNS prime.

Reference: /root/reference/src/bfv/modswitch.rs — a simplified prime-drop
with subtract-correction, explicitly marked non-production there and unused
by the rest of the stack (bootstrap does its own scalar modswitch).  We match
the arithmetic but FIX the reference's stale-params quirk (modswitch.rs:27-30,
flagged in SURVEY.md): the returned ciphertext carries rebuilt params over
the reduced basis.
"""

from __future__ import annotations

from functools import lru_cache

from ..errors import InvalidParam
from ..params import BfvParams, BfvParamsBuilder
from ..ring import wordops as w
from ..ring.rns import from_coeff_residues, to_coeff_residues
from . import BfvCiphertext


@lru_cache(maxsize=None)
def _reduced_params(ring_degree, plain_modulus, moduli, aux_moduli, sigma,
                    gadget_base) -> BfvParams:
    b = (BfvParamsBuilder()
         .ring_degree(ring_degree)
         .plain_modulus(plain_modulus)
         .ct_moduli(list(moduli))
         .sigma(sigma)
         .gadget_base(gadget_base))
    if aux_moduli:
        b = b.aux_moduli(list(aux_moduli))
    return b.build()


def mod_switch_drop_prime(ct: BfvCiphertext) -> BfvCiphertext:
    """Drop the last RNS prime with subtract-correction (simplified).

    c_i' = c_i - (c_last mod q_i) for each remaining prime — preserves the
    value mod the reduced modulus the same way the reference does
    (modswitch.rs:56-80).  Not a noise-rescaling production mod-switch.
    """
    params = ct.params
    if len(params.moduli) <= 1:
        raise InvalidParam("cannot drop: only one RNS component")
    new_params = _reduced_params(params.ring_degree, params.plain_modulus,
                                 params.moduli[:-1], params.aux_moduli,
                                 params.sigma, params.gadget_base)
    basis = params.ct_basis
    new_basis = new_params.ct_basis

    new_c = []
    for poly in ct.c:
        res = to_coeff_residues(basis, poly)
        last = (res[0][..., -1:, :], res[1][..., -1:, :])
        keep = (res[0][..., :-1, :], res[1][..., :-1, :])
        last_mod_qi = w.mod_from_u64(last, new_basis.bq(1), new_basis.bqinv(1),
                                     new_basis.br1(1))
        corrected = w.mod_sub64(keep, last_mod_qi, new_basis.bq(1))
        new_c.append(from_coeff_residues(new_basis, corrected))
    return BfvCiphertext(c=tuple(new_c), params=new_params)
