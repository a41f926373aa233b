"""Bridge between the narrow (single-u32 RNS) engine and the wide engine.

The two engines are different REPRESENTATIONS of the same mathematical
objects: a narrow ciphertext over moduli (q0, q1) and a wide ciphertext over
the same moduli carry identical residues, so conversion is exact (zero noise
cost) — an inverse NTT out of one eval ordering and a forward NTT into the
other.

This is how the narrow engine gets bootstrapping without duplicating the
bootstrap host (reference bfv_host.rs:212-236): convert the limbs to the
wide mirror params, run the wide `bfv_bootstrap` (whose first step is a
modulus switch to q' anyway), and convert the refreshed output back.
"""

from __future__ import annotations

import numpy as np

from . import narrow as nw
from .bfv import BfvCiphertext, SecretKey
from .bootstrap.bfv_host import BootstrapKey, bfv_bootstrap, gen_bootstrap_key
from .errors import InvalidParam
from .params import BfvParams, BfvParamsBuilder
from .ring.rns import from_host_residues, to_u64_host


def wide_mirror_params(params: nw.NarrowParams) -> BfvParams:
    """Wide-engine params over the narrow basis' exact moduli."""
    b = (BfvParamsBuilder()
         .ring_degree(params.ring_degree)
         .plain_modulus(params.plain_modulus)
         .ct_moduli(list(params.moduli))
         .sigma(params.sigma)
         .gadget_base(params.gadget_base))
    if params.aux_moduli:
        b = b.aux_moduli(list(params.aux_moduli))
    return b.build()


def narrow_to_wide(ct: nw.NarrowCiphertext,
                   wide_params: BfvParams | None = None) -> BfvCiphertext:
    """Exact representation change narrow -> wide (same moduli)."""
    params = ct.params
    if ct.c2 is not None:
        raise InvalidParam("convert after relinearization (degree-1 only)")
    wp = wide_params or wide_mirror_params(params)
    if tuple(wp.moduli) != tuple(params.moduli):
        raise InvalidParam("wide params must mirror the narrow moduli")
    comps = []
    for c in (ct.c0, ct.c1):
        res = np.asarray(nw.to_coeff_residues32(params.ct_basis, c),
                         dtype=np.uint64)
        comps.append(from_host_residues(wp.ct_basis, res))
    return BfvCiphertext(c=tuple(comps), params=wp)


def wide_to_narrow(ct: BfvCiphertext,
                   narrow_params: nw.NarrowParams) -> nw.NarrowCiphertext:
    """Exact representation change wide -> narrow (same moduli)."""
    if tuple(ct.params.moduli) != tuple(narrow_params.moduli):
        raise InvalidParam("narrow params must mirror the wide moduli")
    import jax.numpy as jnp

    outs = []
    for comp in ct.c[:2]:
        res = to_u64_host(ct.params.ct_basis, comp).astype(np.uint32)
        outs.append(nw.from_coeff_residues32(narrow_params.ct_basis,
                                             jnp.asarray(res)))
    return nw.NarrowCiphertext(c0=outs[0], c1=outs[1], params=narrow_params)


def narrow_sk_to_wide(sk: nw.NarrowSecretKey,
                      wide_params: BfvParams | None = None) -> SecretKey:
    """The same ternary secret under the wide mirror params."""
    wp = wide_params or wide_mirror_params(sk.params)
    res = np.asarray(nw.to_coeff_residues32(sk.params.ct_basis, sk.poly),
                     dtype=np.uint64)
    return SecretKey(poly=from_host_residues(wp.ct_basis, res), params=wp)


def gen_bootstrap_key_narrow(key, sk: nw.NarrowSecretKey,
                             boot_params: BfvParams,
                             q_prime: int) -> BootstrapKey:
    """Bootstrap key for narrow-engine ciphertexts: same circular-security
    construction as the wide host (reference bfv_host.rs:50-121), with
    orig_params set to the wide mirror so the refreshed output modswitches
    back onto the narrow modulus."""
    wide_sk = narrow_sk_to_wide(sk)
    return gen_bootstrap_key(key, wide_sk, boot_params, q_prime,
                             sk.params.plain_modulus)


def bfv_bootstrap_narrow(ct: nw.NarrowCiphertext,
                         bsk: BootstrapKey) -> nw.NarrowCiphertext:
    """Refresh a narrow BFV ciphertext through the wide bootstrap host."""
    wide = narrow_to_wide(ct, bsk.orig_params)
    refreshed = bfv_bootstrap(wide, bsk)
    return wide_to_narrow(refreshed, ct.params)


def dbfv_bootstrap_narrow(ct: nw.NarrowDbfvCiphertext,
                          bsk: BootstrapKey) -> nw.NarrowDbfvCiphertext:
    """Refresh all limbs (limb axis rides as a batch axis through the wide
    host, mirroring the reference's rayon fan-out bfv_host.rs:225-227);
    resets mul_depth."""
    limbs = bfv_bootstrap_narrow(ct.limbs, bsk)
    return nw.NarrowDbfvCiphertext(limbs=limbs, mul_depth=0,
                                   params=ct.params)


def dbfv_mul_then_bootstrap_narrow(ct1: nw.NarrowDbfvCiphertext,
                                   ct2: nw.NarrowDbfvCiphertext,
                                   rlk: nw.NarrowRelinKey,
                                   bsk: BootstrapKey) -> nw.NarrowDbfvCiphertext:
    """Multiply then refresh — the supported way to chain narrow multiplies
    (reference bfv_host.rs:242-250)."""
    return dbfv_bootstrap_narrow(nw.dbfv_mul(ct1, ct2, rlk), bsk)


def dbfv_mul_chain_then_bootstrap_narrow(cts, rlk: nw.NarrowRelinKey,
                                         bsk: BootstrapKey):
    """Fold a product chain with a refresh after each step
    (reference bfv_host.rs:258-288)."""
    if not cts:
        raise InvalidParam("chain requires at least one ciphertext")
    acc = cts[0]
    for ct in cts[1:]:
        acc = dbfv_mul_then_bootstrap_narrow(acc, ct, rlk, bsk)
    return acc
