"""dBFV: Decomposed BFV — the novel scheme layer.

Reference: /root/reference/src/dbfv/.  Z_p plaintexts are written as d base-b
digits, each encrypted as an independent BFV ciphertext; multiplication is a
degree-d polynomial convolution over the digit variable (d^2 BFV products
summed into 2d-1 limbs) followed by degree reduction modulo the carry
lattice.
"""

from .ciphertext import DbfvCiphertext  # noqa: F401
from .decomposition import (  # noqa: F401
    digit_decompose, digit_recompose, digit_recompose_signed,
    poly_digit_decompose, poly_digit_recompose, poly_digit_recompose_signed,
)
from .encrypt import (  # noqa: F401
    dbfv_encrypt, dbfv_encrypt_sk, dbfv_encrypt_poly, dbfv_encrypt_poly_sk,
)
from .decrypt import dbfv_decrypt, dbfv_decrypt_poly  # noqa: F401
from .eval import dbfv_add, dbfv_sub, dbfv_neg, dbfv_mul  # noqa: F401
from .keygen import dbfv_keygen, dbfv_keygen_full  # noqa: F401
from .keyswitch import dbfv_relinearize  # noqa: F401
from .lattice import LatticeBasis, LatticeReducer, SmallReps  # noqa: F401
from .advanced import (  # noqa: F401
    dbfv_apply_automorphism, dbfv_div_by_base, dbfv_change_base,
)
from . import reduction  # noqa: F401
