"""dBFV key generation wrappers (reference /root/reference/src/dbfv/keygen.rs)."""

from __future__ import annotations

import jax

from ..bfv.keygen import (
    gen_galois_key, gen_public_key, gen_relin_key, gen_secret_key,
)
from ..params import DbfvParams


def dbfv_keygen(key, params: DbfvParams):
    """(sk, pk, rlk) on the underlying BFV params (reference keygen.rs:9-17)."""
    k1, k2, k3 = jax.random.split(key, 3)
    sk = gen_secret_key(k1, params.bfv_params)
    pk = gen_public_key(k2, sk)
    rlk = gen_relin_key(k3, sk)
    return sk, pk, rlk


def dbfv_keygen_full(key, params: DbfvParams, galois_elements=()):
    """Adds Galois keys for the given elements (reference keygen.rs:19-30)."""
    k0, kg = jax.random.split(key)
    sk, pk, rlk = dbfv_keygen(k0, params)
    gks = {}
    for e in galois_elements:
        kg, ke = jax.random.split(kg)
        gks[e] = gen_galois_key(ke, sk, e)
    return sk, pk, rlk, gks
