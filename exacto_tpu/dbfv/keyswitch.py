"""dBFV key switching wrapper (reference /root/reference/src/dbfv/keyswitch.rs).

Per-limb relinearization — with stacked limbs this is a single batched
relinearize call.  Like the reference, unused by the multiply path (relin
happens inside bfv_mul_and_relin); provided for API parity.
"""

from __future__ import annotations

from ..bfv.keyswitch import relinearize
from .ciphertext import DbfvCiphertext


def dbfv_relinearize(ct: DbfvCiphertext, rlk) -> DbfvCiphertext:
    return DbfvCiphertext(limbs=relinearize(ct.limbs, rlk), degree=ct.degree,
                          mul_depth=ct.mul_depth, params=ct.params)
