"""Noise-budget observability API.

The reference buries its noise meters in the repro binary
(/root/reference/src/bin/paper_repro.rs:249-281); here they are first-class
(SURVEY.md section 5 observability note).
"""

from __future__ import annotations

import numpy as np

from ..bfv.encrypt import decrypt as bfv_decrypt
from ..bfv.keygen import SecretKey
from ..ring.rns import crt_to_ints_host


def bfv_noise_inf(ct, sk: SecretKey) -> int:
    """Infinity-norm of the noise |phase - Delta*m| with m re-derived by
    decryption (the reference's meter, paper_repro.rs:249-281)."""
    params = ct.params
    from ..bfv.encrypt import phase_residues_host

    residues = phase_residues_host(ct, sk)
    xs = crt_to_ints_host(params.ct_basis, residues)
    m = bfv_decrypt(ct, sk).coeffs
    big_q = params.big_q
    delta = params.delta
    flat_x = xs.reshape(-1)
    flat_m = np.asarray(m, dtype=np.uint64).reshape(-1)
    worst = 0
    for x, mm in zip(flat_x, flat_m):
        diff = (int(x) - delta * int(mm)) % big_q
        if diff > big_q // 2:
            diff -= big_q
        worst = max(worst, abs(diff))
    return worst


def dbfv_max_limb_noise(ct, sk: SecretKey) -> int:
    """Max over limbs of the BFV phase noise (paper_repro.rs:275-281)."""
    return bfv_noise_inf(ct.limbs, sk)


def noise_budget_bits(ct, sk: SecretKey) -> float:
    """Remaining noise budget log2(Delta / (2*noise)); <= 0 means decryption
    is at risk."""
    import math

    noise = bfv_noise_inf(ct, sk)
    delta = ct.params.delta
    if noise == 0:
        return float("inf")
    return math.log2(delta / (2.0 * noise))


def narrow_noise_inf(ct, sk) -> int:
    """Infinity-norm phase noise for a narrow ciphertext (any L): exact
    object-int CRT of phase = c0 + c1*s, centered distance to Delta*m with
    m re-derived by decryption.  Host verification meter, not a hot op."""
    from .. import narrow as nr
    from ..ring import hostmath as hm

    params = ct.params
    basis = params.ct_basis
    phase = nr.np_add(basis, ct.c0, nr.np_mul(basis, ct.c1, sk.poly))
    res = np.asarray(nr.to_coeff_residues32(basis, phase)).astype(object)
    big_q = params.big_q
    ts = [(big_q // m) * hm.mod_inv((big_q // m) % m, m)
          for m in params.moduli]
    x = sum(t * res[..., i, :] for i, t in enumerate(ts)) % big_q
    m = np.asarray(nr.decrypt(ct, sk), dtype=np.uint64).astype(object)
    delta = params.delta
    diff = (x - delta * m) % big_q
    diff = np.where(diff > big_q // 2, diff - big_q, diff)
    return int(np.abs(diff).max())


def narrow_dbfv_max_limb_noise(ct, sk) -> int:
    """Max over limbs of the narrow BFV phase noise (reference meter role:
    paper_repro.rs:275-281)."""
    return narrow_noise_inf(ct.limbs, sk)
