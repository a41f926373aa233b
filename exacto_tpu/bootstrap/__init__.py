"""Bootstrapping: noise refresh via modulus switch + homomorphic rounding.

Reference: /root/reference/src/bootstrap/.  Pipeline: modulus-switch to a
tiny q', re-encrypt the phase under a second parameter set, then evaluate the
rounding polynomial homomorphically (Paterson-Stockmeyer), using a batched
CoeffsToSlots for general ciphertexts.
"""

from .bfv_host import (  # noqa: F401
    BootstrapKey, gen_bootstrap_key, create_boot_sk,
    bfv_bootstrap, dbfv_bootstrap, dbfv_mul_then_bootstrap,
    dbfv_mul_chain_then_bootstrap,
)
from .coeffs_to_slots import (  # noqa: F401
    coeffs_to_slots, slots_to_coeffs, extract_coefficient,
    required_trace_elements, gen_trace_galois_keys, gen_all_galois_keys,
)
from .digit_extract import (  # noqa: F401
    compute_rounding_poly, lagrange_interpolate, eval_poly_homomorphic,
    trivial_encrypt, trivial_encrypt_poly,
)
