"""BFV scheme: ciphertext type and re-exports.

Reference: /root/reference/src/bfv/mod.rs.  A ciphertext is a tuple of
RnsPoly components (2 fresh, 3 mid-multiply), each shaped [..., L, n] with
arbitrary leading batch dims — "thousands of ciphertexts per chip" is just a
leading axis here.
"""

from __future__ import annotations

import flax.struct

from ..params import BfvParams
from ..ring.rns import RnsPoly


@flax.struct.dataclass
class BfvCiphertext:
    """BFV ciphertext: components (c0, c1[, c2]); degree = len(c) - 1."""

    c: tuple  # tuple[RnsPoly, ...]
    params: BfvParams

    @property
    def degree(self) -> int:
        return len(self.c) - 1

    @property
    def batch_shape(self):
        return self.c[0].batch_shape


from .keygen import (  # noqa: E402,F401
    SecretKey, PublicKey, RelinKey, GaloisKey,
    gen_secret_key, gen_public_key, gen_relin_key, gen_galois_key,
)
from .encoding import (  # noqa: E402,F401
    Plaintext, encode_scalar, decode_scalar, encode_coeffs, decode_coeffs,
    encode_simd, decode_simd,
)
from .encrypt import encrypt_pk, encrypt_sk, decrypt, scale_plaintext  # noqa: E402,F401
from .eval import (  # noqa: E402,F401
    bfv_add, bfv_sub, bfv_neg, bfv_mul_and_relin, bfv_mul_no_relin,
    bfv_plain_mul, bfv_plain_add, bfv_apply_automorphism, bfv_trace,
    bfv_inner_product, bfv_monomial_mul,
)
from .keyswitch import gadget_decompose, relinearize  # noqa: E402,F401
from .modswitch import mod_switch_drop_prime  # noqa: E402,F401
