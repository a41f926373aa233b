"""BFV end-to-end tests: roundtrips, add/sub/mul, automorphisms, encodings.

Mirrors the reference's inline test tiers (/root/reference/src/bfv/*.rs
test modules) on the compact preset and small custom parameter sets.
"""

import numpy as np
import jax
import pytest

from exacto_tpu.params import BfvParamsBuilder
from exacto_tpu.params.presets import compact_bfv
from exacto_tpu import bfv
from exacto_tpu.bfv import (
    encode_scalar, decode_scalar, encode_coeffs, decode_coeffs,
    encode_simd, decode_simd,
    encrypt_pk, encrypt_sk, decrypt,
    gen_secret_key, gen_public_key, gen_relin_key, gen_galois_key,
    bfv_add, bfv_sub, bfv_neg, bfv_mul_and_relin,
    bfv_plain_mul, bfv_plain_add, bfv_apply_automorphism, bfv_monomial_mul,
)
from exacto_tpu.bfv.encoding import Plaintext


def tiny_params(**kw):
    """n=16 params with HPS aux basis — fast test fixture."""
    defaults = dict(n=16, p=257, q=[1099509805057], aux=[562949953443841])
    defaults.update(kw)
    b = (BfvParamsBuilder()
         .ring_degree(defaults["n"])
         .plain_modulus(defaults["p"])
         .ct_moduli(defaults["q"])
         .sigma(3.2))
    if defaults["aux"]:
        b = b.aux_moduli(defaults["aux"])
    return b.build()


KEY = jax.random.PRNGKey(42)


def keys_for(params, want_pk=False, want_rlk=False):
    ks = jax.random.split(KEY, 4)
    sk = gen_secret_key(ks[0], params)
    out = [sk]
    if want_pk:
        out.append(gen_public_key(ks[1], sk))
    if want_rlk:
        out.append(gen_relin_key(ks[2], sk))
    return out


def test_encrypt_decrypt_sk_tiny():
    params = tiny_params()
    (sk,) = keys_for(params)
    for value in [0, 42, 256]:
        pt = encode_scalar(value, params)
        ct = encrypt_sk(jax.random.PRNGKey(value + 1), pt, sk)
        dec = decrypt(ct, sk)
        assert decode_scalar(dec) == value % 257


def test_encrypt_decrypt_pk_compact():
    params = compact_bfv()
    sk, pk = keys_for(params, want_pk=True)
    pt = encode_scalar(100, params)
    ct = encrypt_pk(jax.random.PRNGKey(7), pt, pk)
    assert decode_scalar(decrypt(ct, sk)) == 100


def test_encrypt_decrypt_poly():
    params = tiny_params()
    (sk,) = keys_for(params)
    values = [1, 2, 3, 4, 5]
    pt = encode_coeffs(values, params)
    ct = encrypt_sk(jax.random.PRNGKey(9), pt, sk)
    dec = decrypt(ct, sk)
    assert list(decode_coeffs(dec, 5)) == values


def test_homomorphic_add_sub_neg():
    params = tiny_params()
    (sk,) = keys_for(params)
    ct1 = encrypt_sk(jax.random.PRNGKey(1), encode_scalar(50, params), sk)
    ct2 = encrypt_sk(jax.random.PRNGKey(2), encode_scalar(20, params), sk)
    assert decode_scalar(decrypt(bfv_add(ct1, ct2), sk)) == 70
    assert decode_scalar(decrypt(bfv_sub(ct1, ct2), sk)) == 30
    assert decode_scalar(decrypt(bfv_neg(ct2), sk)) == (257 - 20)


def test_homomorphic_mul_hps_tiny():
    params = tiny_params()
    sk, rlk = keys_for(params, want_rlk=True)
    for a, b in [(3, 7), (0, 5), (16, 16)]:
        ct1 = encrypt_sk(jax.random.PRNGKey(a + 100), encode_scalar(a, params), sk)
        ct2 = encrypt_sk(jax.random.PRNGKey(b + 200), encode_scalar(b, params), sk)
        ct_prod = bfv_mul_and_relin(ct1, ct2, rlk)
        assert decode_scalar(decrypt(ct_prod, sk)) == (a * b) % 257, (a, b)


@pytest.mark.slow
def test_homomorphic_mul_compact():
    params = compact_bfv()
    sk, rlk = keys_for(params, want_rlk=True)
    ct1 = encrypt_sk(jax.random.PRNGKey(11), encode_scalar(3, params), sk)
    ct2 = encrypt_sk(jax.random.PRNGKey(12), encode_scalar(7, params), sk)
    assert decode_scalar(decrypt(bfv_mul_and_relin(ct1, ct2, rlk), sk)) == 21


@pytest.mark.slow
def test_homomorphic_mul_multi_prime_q():
    # multi-prime Q exercises the exact host fallback (reference eval.rs:903-927)
    params = (BfvParamsBuilder()
              .ring_degree(16)
              .plain_modulus(257)
              .ct_moduli([65537, 1099509805057])
              .sigma(3.2)
              .gadget_base(8)
              .build())
    sk, rlk = keys_for(params, want_rlk=True)
    for a, b, expected in [(3, 7, 21), (10, 20, 200), (0, 5, 0)]:
        ct1 = encrypt_sk(jax.random.PRNGKey(a + 1), encode_scalar(a, params), sk)
        ct2 = encrypt_sk(jax.random.PRNGKey(b + 50), encode_scalar(b, params), sk)
        ct_prod = bfv.bfv_mul_no_relin(ct1, ct2)
        # relinearize needs single-prime Q; decrypt the degree-2 ct directly
        assert decode_scalar(decrypt(ct_prod, sk)) == expected


def test_plain_ops():
    params = tiny_params()
    (sk,) = keys_for(params)
    ct = encrypt_sk(jax.random.PRNGKey(3), encode_scalar(10, params), sk)
    assert decode_scalar(decrypt(bfv_plain_add(ct, encode_scalar(5, params)), sk)) == 15
    # raw plaintext multiply: scalar 3 at coeff 0
    pt3 = encode_scalar(3, params)
    assert decode_scalar(decrypt(bfv_plain_mul(ct, pt3), sk)) == 30


def test_apply_automorphism_scalar_and_poly():
    params = tiny_params()
    (sk,) = keys_for(params)
    gk = gen_galois_key(jax.random.PRNGKey(77), sk, 3)

    ct = encrypt_sk(jax.random.PRNGKey(4), encode_scalar(10, params), sk)
    assert decode_scalar(decrypt(bfv_apply_automorphism(ct, gk), sk)) == 10

    coeffs = np.zeros(params.ring_degree, dtype=np.uint64)
    coeffs[0], coeffs[1] = 1, 2
    pt = Plaintext(coeffs=coeffs, modulus=params.plain_modulus)
    ct2 = encrypt_sk(jax.random.PRNGKey(5), pt, sk)
    dec = decrypt(bfv_apply_automorphism(ct2, gk), sk)
    # 1 + 2X -> 1 + 2X^3
    assert dec.coeffs[0] == 1 and dec.coeffs[1] == 0 and dec.coeffs[3] == 2


def test_monomial_mul():
    params = tiny_params()
    (sk,) = keys_for(params)
    coeffs = np.zeros(params.ring_degree, dtype=np.uint64)
    coeffs[0], coeffs[2] = 5, 1
    pt = Plaintext(coeffs=coeffs, modulus=params.plain_modulus)
    ct = encrypt_sk(jax.random.PRNGKey(6), pt, sk)
    n = params.ring_degree
    # X^1 * (5 + X^2) = 5X + X^3
    dec = decrypt(bfv_monomial_mul(ct, 1), sk)
    assert dec.coeffs[1] == 5 and dec.coeffs[3] == 1
    # X^{n-2}*(5 + X^2) = 5X^{n-2} + X^n = 5X^{n-2} - 1
    dec2 = decrypt(bfv_monomial_mul(ct, n - 2), sk)
    assert dec2.coeffs[n - 2] == 5 and dec2.coeffs[0] == params.plain_modulus - 1


def test_batched_encrypt_decrypt():
    params = tiny_params()
    (sk,) = keys_for(params)
    pt = encode_scalar(9, params)
    ct = encrypt_sk(jax.random.PRNGKey(8), pt, sk, batch_shape=(4,))
    dec = decrypt(ct, sk)
    assert dec.coeffs.shape == (4, params.ring_degree)
    assert all(int(dec.coeffs[b, 0]) == 9 for b in range(4))


def test_simd_slot_encoding_roundtrip():
    params = tiny_params(p=97)  # 97 = 1 mod 32, prime -> 16 slots
    vals = [1, 5, 96, 0, 7]
    pt = encode_simd(vals, params)
    got = decode_simd(pt, len(vals))
    assert list(got) == vals


def test_simd_slots_multiply_elementwise():
    params = tiny_params(p=97)
    sk, rlk = keys_for(params, want_rlk=True)
    a = [2, 3, 4]
    b = [5, 6, 7]
    ct1 = encrypt_sk(jax.random.PRNGKey(21), encode_simd(a, params), sk)
    ct2 = encrypt_sk(jax.random.PRNGKey(22), encode_simd(b, params), sk)
    prod = decrypt(bfv_mul_and_relin(ct1, ct2, rlk), sk)
    got = decode_simd(prod, 3)
    assert list(got) == [x * y % 97 for x, y in zip(a, b)]
