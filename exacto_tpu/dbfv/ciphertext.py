"""dBFV ciphertext: d BFV limbs stacked on a tensor axis.

Reference: /root/reference/src/dbfv/ciphertext.rs keeps a Vec of
BfvCiphertexts; here the limbs live on one stacked axis at position -3 of
every component (shape [..., num_limbs, L, n]), so limb-wise ops are single
batched kernels and the d^2 multiply fan-out is one broadcast multiply —
the TPU-native replacement for the reference's rayon par_iter
(dbfv/eval.rs:117).
"""

from __future__ import annotations

import flax.struct

from ..bfv import BfvCiphertext
from ..params import DbfvParams


@flax.struct.dataclass
class DbfvCiphertext:
    """limbs: BfvCiphertext whose polys carry a limb axis at -3.

    degree: number of limbs (d normally, 2d-1 mid-multiply).
    mul_depth: multiplications since last bootstrap (guard counter,
    reference ciphertext.rs:10-33).
    """

    limbs: BfvCiphertext
    degree: int = flax.struct.field(pytree_node=False)
    mul_depth: int = flax.struct.field(pytree_node=False)
    params: DbfvParams = None

    @property
    def num_limbs(self) -> int:
        return self.degree

    @property
    def batch_shape(self):
        return self.limbs.c[0].lo.shape[:-3]
