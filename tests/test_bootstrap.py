"""Bootstrap tests: rounding poly, Lagrange, P-S eval, coefficient
extraction, BFV + dBFV bootstrap, mul-then-bootstrap chains.

Mirrors /root/reference/src/bootstrap/* test modules with the same shrunken
parameter sets (n=16, tiny moduli).
"""

import numpy as np
import jax
import pytest

from exacto_tpu.params import BfvParamsBuilder, DbfvParams
from exacto_tpu.bfv import (
    encode_scalar, decode_scalar, encrypt_sk, decrypt,
    gen_secret_key, gen_relin_key,
)
from exacto_tpu.bfv.encoding import Plaintext
from exacto_tpu.bootstrap import (
    compute_rounding_poly, lagrange_interpolate, eval_poly_homomorphic,
    trivial_encrypt, gen_bootstrap_key, create_boot_sk,
    bfv_bootstrap, dbfv_bootstrap, dbfv_mul_then_bootstrap,
    dbfv_mul_chain_then_bootstrap,
    coeffs_to_slots, slots_to_coeffs, gen_all_galois_keys,
    required_trace_elements,
)
from exacto_tpu.dbfv import dbfv_encrypt_sk, dbfv_decrypt, dbfv_mul


#: ~50-bit NTT primes = 1 mod 32; 3 primes fund the depth-13 P-S chain, the
#: 4th funds multiplying two bootstrapped ciphertexts (chain test)
BOOT_PRIMES = [1125899906842817, 1125899906843009, 1125899906843233]
BOOT_PRIMES_DEEP = BOOT_PRIMES + [1125899906843617]


def bootstrap_test_params():
    """Sound variant of reference bfv_host.rs:345-364 (orig n=16 q=65537 t=5).

    DIVERGENCE: the reference's boot params (t_boot=29, 51-bit Q, dense
    secret) are mathematically unsound for the general ring path — the
    integer phase wraps mod t_boot for ~half of honest encryptions and the
    degree-148 P-S chain exceeds the 50-bit noise budget (verified by
    simulation).  We use a sparse secret (h=2, bounding |phase| < t_boot/2
    = 48), centered rounding tabulation, and a 3-prime 150-bit boot modulus
    that funds the depth-13 Paterson-Stockmeyer chain.
    """
    orig = (BfvParamsBuilder().ring_degree(16).plain_modulus(5)
            .ct_moduli([65537]).sigma(3.2).build())
    boot = (BfvParamsBuilder().ring_degree(16).plain_modulus(97)
            .ct_moduli(BOOT_PRIMES_DEEP).sigma(3.2).gadget_base(256).build())
    return orig, boot, 25


def dbfv_bootstrap_test_params():
    """dBFV bootstrap fixture (role of reference bfv_host.rs:366-388) on the
    sound parameter family: digits b=2, d=2, p=4 -> BFV digit modulus t=5,
    same boot scheme as bootstrap_test_params."""
    # 40-bit orig modulus: the post-mul noise must clear the modswitch
    # tolerance q'/(2t) with margin, which 16-bit q=65537 cannot
    orig_bfv = (BfvParamsBuilder().ring_degree(16).plain_modulus(5)
                .ct_moduli([1099509805057]).sigma(3.2).build())
    dbfv = DbfvParams.create(orig_bfv, 2, 2, 4)
    boot_bfv = (BfvParamsBuilder().ring_degree(16).plain_modulus(97)
                .ct_moduli(BOOT_PRIMES_DEEP).sigma(3.2).gadget_base(256).build())
    return dbfv, boot_bfv, 25


def test_lagrange_interpolate():
    assert lagrange_interpolate([0, 1, 2], 7)[:2] == [0, 1]
    coeffs = lagrange_interpolate([0, 1, 4, 2], 7)
    assert coeffs == [0, 0, 1, 0]
    p = 29
    values = [(i * i + 3 * i + 7) % p for i in range(10)]
    cs = lagrange_interpolate(values, p)
    for x, want in enumerate(values):
        got = sum(c * pow(x, k, p) for k, c in enumerate(cs)) % p
        assert got == want


def test_rounding_poly():
    # centered tabulation (x > tb/2 means x - tb) with the digit pre-scaled
    # into Z_tb: output round(m * tb / t) — see compute_rounding_poly
    t, qp, tb = 5, 25, 29
    poly = compute_rounding_poly(t, qp, tb)
    for x in range(tb):
        xc = x - tb if x > tb // 2 else x
        m = ((t * (xc % qp) + qp // 2) // qp) % t
        want = ((2 * m * tb + t) // (2 * t)) % tb
        got = sum(c * pow(x, k, tb) for k, c in enumerate(poly)) % tb
        assert got == want, x


def test_required_trace_elements():
    assert required_trace_elements(8) == [3, 5, 7, 9, 11, 13, 15]
    assert required_trace_elements(64) == [65, 33, 17, 9, 5, 3]


def test_trivial_encrypt_decrypt():
    params = (BfvParamsBuilder().ring_degree(16).plain_modulus(257)
              .ct_moduli([1099509805057]).sigma(3.2).build())
    sk = gen_secret_key(jax.random.PRNGKey(0), params)
    for m in [0, 1, 42, 100, 256]:
        ct = trivial_encrypt(m, params)
        assert decode_scalar(decrypt(ct, sk)) == m


def test_eval_poly_homomorphic():
    params = (BfvParamsBuilder().ring_degree(16).plain_modulus(97)
              .ct_moduli([1125899906842817]).sigma(3.2).gadget_base(8).build())
    sk = gen_secret_key(jax.random.PRNGKey(1), params)
    rlk = gen_relin_key(jax.random.PRNGKey(2), sk)
    # f(x) = 3 + 2x + x^3 mod 97
    poly = [3, 2, 0, 1]
    for x in [0, 1, 5, 10]:
        ct = encrypt_sk(jax.random.PRNGKey(x + 10), encode_scalar(x, params), sk)
        got = decode_scalar(decrypt(eval_poly_homomorphic(ct, poly, rlk), sk))
        assert got == (3 + 2 * x + x**3) % 97, x


@pytest.mark.slow
def test_coeffs_to_slots_roundtrip():
    params = (BfvParamsBuilder().ring_degree(16).plain_modulus(97)
              .ct_moduli([1125899906842817]).sigma(3.2).gadget_base(8).build())
    n, t = 16, 97
    sk = gen_secret_key(jax.random.PRNGKey(3), params)
    gks = gen_all_galois_keys(jax.random.PRNGKey(4), sk)

    pt_coeffs = np.array([(i + 1) % t for i in range(n)], dtype=np.uint64)
    pt = Plaintext(coeffs=pt_coeffs, modulus=t)
    ct = encrypt_sk(jax.random.PRNGKey(5), pt, sk)

    slots = coeffs_to_slots(ct, gks)  # batched [n]
    dec = decrypt(slots, sk)
    assert dec.coeffs.shape == (n, n)
    for j in range(n):
        assert int(dec.coeffs[j, 0]) == pt_coeffs[j], f"slot {j}"

    recon = slots_to_coeffs(slots)
    dec2 = decrypt(recon, sk)
    np.testing.assert_array_equal(dec2.coeffs, pt_coeffs)


@pytest.mark.slow
def test_bootstrap_trivial_fast_path():
    orig, boot, q_prime = bootstrap_test_params()
    sk = gen_secret_key(jax.random.PRNGKey(6), orig, hamming_weight=2)
    bsk = gen_bootstrap_key(jax.random.PRNGKey(7), sk, boot, q_prime,
                            orig.plain_modulus)
    # refreshed ciphertexts come back under the ORIGINAL scheme
    for m in range(5):
        ct = trivial_encrypt(m, orig)
        ct_boot = bfv_bootstrap(ct, bsk)
        assert ct_boot.params.moduli == orig.moduli
        got = decode_scalar(decrypt(ct_boot, sk))
        assert got == m, m


@pytest.mark.slow
def test_bootstrap_ring_full():
    orig, boot, q_prime = bootstrap_test_params()
    sk = gen_secret_key(jax.random.PRNGKey(8), orig, hamming_weight=2)
    bsk = gen_bootstrap_key(jax.random.PRNGKey(9), sk, boot, q_prime,
                            orig.plain_modulus)
    for seed, m in [(10, 3), (11, 1)]:
        ct = encrypt_sk(jax.random.PRNGKey(seed), encode_scalar(m, orig), sk)
        assert decode_scalar(decrypt(ct, sk)) == m
        ct_boot = bfv_bootstrap(ct, bsk)
        got = decode_scalar(decrypt(ct_boot, sk))
        assert got == m


@pytest.mark.slow
def test_dbfv_mul_then_bootstrap_allows_next_mul():
    dbfv_params, boot_bfv, q_prime = dbfv_bootstrap_test_params()
    k = jax.random.PRNGKey(777)
    k1, k2, k3, k4, k5 = jax.random.split(k, 5)
    sk = gen_secret_key(k1, dbfv_params.bfv_params, hamming_weight=2)
    rlk = gen_relin_key(k2, sk)
    bsk = gen_bootstrap_key(k3, sk, boot_bfv, q_prime,
                            dbfv_params.bfv_params.plain_modulus)

    # p = 4 (b=2, d=2): 3 * 2 = 6 = 2 mod 4
    ct1 = dbfv_encrypt_sk(k4, 3, sk, dbfv_params)
    ct2 = dbfv_encrypt_sk(k5, 2, sk, dbfv_params)

    # mul + bootstrap: resets depth, refreshed under the ORIGINAL scheme
    prod = dbfv_mul_then_bootstrap(ct1, ct2, rlk, bsk)
    assert prod.mul_depth == 0
    assert prod.params.bfv_params.moduli == dbfv_params.bfv_params.moduli
    assert dbfv_decrypt(prod, sk) == (3 * 2) % 4

    # chain: (3*2)*3 = 18 = 2 mod 4 — a second full mul+bootstrap cycle
    chain = dbfv_mul_chain_then_bootstrap([ct1, ct2, ct1], rlk, bsk)
    assert dbfv_decrypt(chain, sk) == (3 * 2 * 3) % 4
