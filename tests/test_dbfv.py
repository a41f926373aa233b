"""dBFV end-to-end tests: roundtrips, add/sub with borrows, the d^2 multiply,
depth guard, lattice reduction, advanced ops.

Mirrors the reference's dbfv test tiers (/root/reference/src/dbfv/*.rs tests)
including the u64 semantics (p = 2^64 sentinel) on a shrunken n=16 ring for
speed — same moduli, same digit structure.
"""

import numpy as np
import jax
import pytest

from exacto_tpu.params import BfvParamsBuilder, DbfvParams
from exacto_tpu.params.presets import compact_dbfv
from exacto_tpu.bfv import gen_secret_key, gen_public_key, gen_relin_key, gen_galois_key
from exacto_tpu.dbfv import (
    dbfv_encrypt, dbfv_encrypt_sk, dbfv_encrypt_poly_sk,
    dbfv_decrypt, dbfv_decrypt_poly,
    dbfv_add, dbfv_sub, dbfv_neg, dbfv_mul,
    dbfv_apply_automorphism, dbfv_div_by_base, dbfv_change_base,
    digit_decompose, digit_recompose, digit_recompose_signed,
    LatticeBasis, LatticeReducer, SmallReps,
)
from exacto_tpu.errors import NotImplementedYet


def tiny_dbfv(base=16, d=2, p=256, t=929):
    bfv = (BfvParamsBuilder()
           .ring_degree(16)
           .plain_modulus(t)
           .ct_moduli([1099509805057])
           .aux_moduli([562949953443841])
           .sigma(3.2)
           .build())
    return DbfvParams.create(bfv, base, d, p)


def mini_u64_dbfv():
    """u64 profile (p=2^64, b=256, d=8) on n=16 — same moduli as u64_dbfv."""
    bfv = (BfvParamsBuilder()
           .ring_degree(16)
           .plain_modulus(1040407)
           .ct_moduli([1152921504606830593])
           .aux_moduli([18014398509998081, 36028797018972161])
           .gadget_base(256)
           .sigma(3.2)
           .build())
    return DbfvParams.create(bfv, 256, 8, 0)


def test_digit_decompose_recompose():
    assert digit_decompose(42, 16, 2) == [10, 2]
    assert digit_decompose(255, 16, 2) == [15, 15]
    for v in [0, 1, 42, 255, 12345, 65535]:
        assert digit_recompose(digit_decompose(v, 16, 4), 16, 65536) == v
    # signed: [-2, 2] in base 16 with t=929 -> 30 mod 256
    assert digit_recompose_signed([927, 2], 16, 256, 929) == 30
    # u64 sentinel
    assert digit_recompose(digit_decompose(2**64 - 1, 256, 8), 256, 0) == 2**64 - 1


def test_lattice_basis_and_babai():
    lb = LatticeBasis(16, 2, 256)
    assert lb.basis == [[16, -1], [256, 0]]
    for row in lb.basis:
        val = sum(a * 16**j for j, a in enumerate(row))
        assert val % 256 == 0

    red = LatticeReducer(16, 2, 256)
    assert red.reduce_digits([3, 7]) == [3, 7]
    for digits in [[21, 0], [14, 2], [-30, 5], [100, 30]]:
        out = red.reduce_digits(digits)
        orig = sum(a * 16**j for j, a in enumerate(digits))
        new = sum(a * 16**j for j, a in enumerate(out))
        assert orig % 256 == new % 256, digits
        assert all(abs(x) <= 16 for x in out), (digits, out)
    # SmallReps simple: b^j mod p digits
    sr = SmallReps.compute_simple(16, 2, 256)
    assert sr.reps == [[0, 0]]  # 16^2 mod 256 = 0


@pytest.fixture(scope="module")
def compact_setup():
    params = compact_dbfv()
    key = jax.random.PRNGKey(42)
    k1, k2, k3 = jax.random.split(key, 3)
    sk = gen_secret_key(k1, params.bfv_params)
    pk = gen_public_key(k2, sk)
    rlk = gen_relin_key(k3, sk)
    return params, sk, pk, rlk


@pytest.mark.slow
def test_dbfv_roundtrip_pk_sk(compact_setup):
    params, sk, pk, _ = compact_setup
    for v in [0, 255]:
        ct = dbfv_encrypt(jax.random.PRNGKey(v), v, pk, params)
        assert dbfv_decrypt(ct, sk) == v
        ct2 = dbfv_encrypt_sk(jax.random.PRNGKey(v + 99), v, sk, params)
        assert dbfv_decrypt(ct2, sk) == v


def test_dbfv_add_sub_neg(compact_setup):
    params, sk, pk, _ = compact_setup
    ct1 = dbfv_encrypt(jax.random.PRNGKey(1), 10, pk, params)
    ct2 = dbfv_encrypt(jax.random.PRNGKey(2), 20, pk, params)
    assert dbfv_decrypt(dbfv_add(ct1, ct2), sk) == 30
    # 50 - 20 crosses a digit borrow: [2,3] - [4,1] = [-2,2] -> 30
    ct50 = dbfv_encrypt(jax.random.PRNGKey(3), 50, pk, params)
    assert dbfv_decrypt(dbfv_sub(ct50, ct2), sk) == 30
    assert dbfv_decrypt(dbfv_neg(ct2), sk) == 256 - 20


@pytest.mark.slow
def test_dbfv_mul_and_depth_guard(compact_setup):
    params, sk, pk, rlk = compact_setup
    # products crossing the base boundary (reference eval.rs:273-290)
    for a, b in [(15, 17), (20, 13)]:
        ct1 = dbfv_encrypt(jax.random.PRNGKey(a), a, pk, params)
        ct2 = dbfv_encrypt(jax.random.PRNGKey(b + 40), b, pk, params)
        prod = dbfv_mul(ct1, ct2, rlk)
        assert dbfv_decrypt(prod, sk) == (a * b) % 256, (a, b)

    # chained multiplication is rejected (reference eval.rs:96-101)
    ct1 = dbfv_encrypt(jax.random.PRNGKey(7), 3, pk, params)
    ct2 = dbfv_encrypt(jax.random.PRNGKey(8), 4, pk, params)
    prod = dbfv_mul(ct1, ct2, rlk)
    with pytest.raises(NotImplementedYet):
        dbfv_mul(prod, ct1, rlk)


def test_dbfv_poly_roundtrip_and_add(compact_setup):
    params, sk, _, _ = compact_setup
    n = params.bfv_params.ring_degree
    rng = np.random.default_rng(0)
    coeffs = rng.integers(0, 256, n, dtype=np.uint64)
    ct = dbfv_encrypt_poly_sk(jax.random.PRNGKey(11), coeffs, sk, params)
    got = dbfv_decrypt_poly(ct, sk)
    np.testing.assert_array_equal(got, coeffs)

    coeffs2 = rng.integers(0, 256, n, dtype=np.uint64)
    ct2 = dbfv_encrypt_poly_sk(jax.random.PRNGKey(12), coeffs2, sk, params)
    got_sum = dbfv_decrypt_poly(dbfv_add(ct, ct2), sk)
    np.testing.assert_array_equal(got_sum, (coeffs + coeffs2) % 256)


def test_dbfv_automorphism(compact_setup):
    params, sk, pk, _ = compact_setup
    gk = gen_galois_key(jax.random.PRNGKey(55), sk, 3)
    ct = dbfv_encrypt(jax.random.PRNGKey(21), 42, pk, params)
    assert dbfv_decrypt(dbfv_apply_automorphism(ct, gk), sk) == 42


def test_dbfv_div_by_base(compact_setup):
    params, sk, _, _ = compact_setup
    ct = dbfv_encrypt_sk(jax.random.PRNGKey(31), 48, sk, params)
    ct_div = dbfv_div_by_base(ct)
    assert ct_div.params.plain_modulus == 16
    assert dbfv_decrypt(ct_div, sk) == 3


def test_dbfv_change_base(compact_setup):
    params, sk, _, _ = compact_setup
    for v in [0, 42, 255]:
        ct = dbfv_encrypt_sk(jax.random.PRNGKey(v + 60), v, sk, params)
        ct4 = dbfv_change_base(ct, 4, 4)
        assert dbfv_decrypt(ct4, sk) == v


@pytest.mark.slow
def test_dbfv_u64_semantics_mini():
    """u64 (p=2^64) encrypt/add/sub/mul roundtrips incl. u64::MAX
    (reference eval.rs:316-327) on the shrunken ring."""
    params = mini_u64_dbfv()
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    sk = gen_secret_key(k1, params.bfv_params)
    pk = gen_public_key(k2, sk)
    rlk = gen_relin_key(k3, sk)

    M = 2**64
    vals = [0, 2**64 - 1, 0xDEADBEEFCAFEBABE]
    for v in vals:
        ct = dbfv_encrypt_sk(jax.random.PRNGKey(v % 1000), v, sk, params)
        assert dbfv_decrypt(ct, sk) == v, v

    a, b = 0xDEADBEEFCAFEBABE, 0x123456789ABCDEF
    cta = dbfv_encrypt_sk(jax.random.PRNGKey(101), a, sk, params)
    ctb = dbfv_encrypt_sk(jax.random.PRNGKey(102), b, sk, params)
    assert dbfv_decrypt(dbfv_add(cta, ctb), sk) == (a + b) % M
    assert dbfv_decrypt(dbfv_sub(cta, ctb), sk) == (a - b) % M
    assert dbfv_decrypt(dbfv_mul(cta, ctb, rlk), sk) == (a * b) % M


def test_dbfv_batched(compact_setup):
    params, sk, _, _ = compact_setup
    vals = np.array([3, 100, 255, 0], dtype=np.uint64)
    ct = dbfv_encrypt_sk(jax.random.PRNGKey(77), vals, sk, params)
    got = dbfv_decrypt(ct, sk)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.uint64), vals)
