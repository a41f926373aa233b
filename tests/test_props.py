"""Property-based integration tests.

Mirrors /root/reference/tests/protocol_props.rs: randomized scalar and
sparse-polynomial roundtrips, adds and multiplies checked against independent
host models (exact negacyclic convolution, Python-int digit recomposition).
Seeded numpy randomness plays the role of proptest.
"""

import numpy as np
import jax
import pytest

from exacto_tpu.params import BfvParamsBuilder, DbfvParams
from exacto_tpu.bfv import (
    encode_scalar, decode_scalar, encrypt_sk, decrypt,
    gen_secret_key, gen_relin_key, bfv_add, bfv_mul_and_relin,
)
from exacto_tpu.bfv.encoding import Plaintext
from exacto_tpu.dbfv import (
    dbfv_encrypt_sk, dbfv_encrypt_poly_sk, dbfv_decrypt, dbfv_decrypt_poly,
    dbfv_add, dbfv_mul,
)
from exacto_tpu.ring.poly import negacyclic_mul_host


N = 16


@pytest.fixture(scope="module")
def bfv_setup():
    params = (BfvParamsBuilder().ring_degree(N).plain_modulus(257)
              .ct_moduli([1099509805057]).aux_moduli([562949953443841])
              .sigma(3.2).build())
    sk = gen_secret_key(jax.random.PRNGKey(0), params)
    rlk = gen_relin_key(jax.random.PRNGKey(1), sk)
    return params, sk, rlk


@pytest.fixture(scope="module")
def dbfv_setup():
    bfv = (BfvParamsBuilder().ring_degree(N).plain_modulus(929)
           .ct_moduli([1099509805057]).aux_moduli([562949953443841])
           .sigma(3.2).build())
    params = DbfvParams.create(bfv, 16, 2, 256)
    sk = gen_secret_key(jax.random.PRNGKey(2), bfv)
    rlk = gen_relin_key(jax.random.PRNGKey(3), sk)
    return params, sk, rlk


@pytest.mark.slow
def test_prop_bfv_scalar_roundtrip_add_mul(bfv_setup):
    params, sk, rlk = bfv_setup
    rng = np.random.default_rng(7)
    # batch the whole property sweep: one encryption per random scalar
    a = rng.integers(0, 257, 12, dtype=np.uint64)
    b = rng.integers(0, 257, 12, dtype=np.uint64)
    pts_a = np.zeros((12, N), dtype=np.uint64)
    pts_a[:, 0] = a
    pts_b = np.zeros((12, N), dtype=np.uint64)
    pts_b[:, 0] = b
    ct_a = encrypt_sk(jax.random.PRNGKey(10), Plaintext(pts_a, 257), sk)
    ct_b = encrypt_sk(jax.random.PRNGKey(11), Plaintext(pts_b, 257), sk)

    np.testing.assert_array_equal(decrypt(ct_a, sk).coeffs[:, 0], a)
    np.testing.assert_array_equal(
        decrypt(bfv_add(ct_a, ct_b), sk).coeffs[:, 0], (a + b) % 257)
    np.testing.assert_array_equal(
        decrypt(bfv_mul_and_relin(ct_a, ct_b, rlk), sk).coeffs[:, 0],
        (a * b) % 257)


def test_prop_bfv_sparse_poly_mul_vs_model(bfv_setup):
    params, sk, rlk = bfv_setup
    rng = np.random.default_rng(8)
    for trial in range(4):
        pa = np.zeros(N, dtype=np.uint64)
        pb = np.zeros(N, dtype=np.uint64)
        for _ in range(3):  # sparse polynomials
            pa[rng.integers(0, N)] = rng.integers(0, 16)
            pb[rng.integers(0, N)] = rng.integers(0, 16)
        ct_a = encrypt_sk(jax.random.PRNGKey(20 + trial), Plaintext(pa, 257), sk)
        ct_b = encrypt_sk(jax.random.PRNGKey(40 + trial), Plaintext(pb, 257), sk)
        got = decrypt(bfv_mul_and_relin(ct_a, ct_b, rlk), sk).coeffs
        want = negacyclic_mul_host([int(x) for x in pa], [int(x) for x in pb], 257)
        assert [int(x) for x in got] == want, trial

        got_add = decrypt(bfv_add(ct_a, ct_b), sk).coeffs
        np.testing.assert_array_equal(got_add, (pa + pb) % 257)


@pytest.mark.slow
def test_prop_dbfv_full_range_z256(dbfv_setup):
    params, sk, rlk = dbfv_setup
    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, 10, dtype=np.uint64)
    b = rng.integers(0, 256, 10, dtype=np.uint64)
    ct_a = dbfv_encrypt_sk(jax.random.PRNGKey(30), a, sk, params)
    ct_b = dbfv_encrypt_sk(jax.random.PRNGKey(31), b, sk, params)
    np.testing.assert_array_equal(
        np.asarray(dbfv_decrypt(ct_a, sk), dtype=np.uint64), a)
    np.testing.assert_array_equal(
        np.asarray(dbfv_decrypt(dbfv_add(ct_a, ct_b), sk), dtype=np.uint64),
        (a + b) % 256)
    np.testing.assert_array_equal(
        np.asarray(dbfv_decrypt(dbfv_mul(ct_a, ct_b, rlk), sk), dtype=np.uint64),
        (a * b) % 256)


def test_prop_dbfv_poly_vs_model(dbfv_setup):
    params, sk, rlk = dbfv_setup
    rng = np.random.default_rng(10)
    pa = np.zeros(N, dtype=np.uint64)
    for _ in range(3):
        pa[rng.integers(0, N)] = rng.integers(0, 256)
    pb = np.zeros(N, dtype=np.uint64)
    for _ in range(3):
        pb[rng.integers(0, N)] = rng.integers(0, 256)
    ct_a = dbfv_encrypt_poly_sk(jax.random.PRNGKey(50), pa, sk, params)
    ct_b = dbfv_encrypt_poly_sk(jax.random.PRNGKey(51), pb, sk, params)
    got = dbfv_decrypt_poly(dbfv_add(ct_a, ct_b), sk)
    np.testing.assert_array_equal(got, (pa + pb) % 256)


def test_prop_dbfv_sparse_poly_mul_vs_model(dbfv_setup):
    """Random sparse polynomial dBFV *multiply* checked against the
    independent negacyclic-convolution model — the missing mirror of
    /root/reference/tests/protocol_props.rs:105-156 (the reference checks
    sparse poly mul against a sparse convolution model)."""
    params, sk, rlk = dbfv_setup
    rng = np.random.default_rng(11)
    for trial in range(3):
        pa = np.zeros(N, dtype=np.uint64)
        pb = np.zeros(N, dtype=np.uint64)
        for _ in range(3):
            pa[rng.integers(0, N)] = rng.integers(0, 256)
            pb[rng.integers(0, N)] = rng.integers(0, 256)
        ct_a = dbfv_encrypt_poly_sk(jax.random.PRNGKey(60 + trial), pa, sk,
                                    params)
        ct_b = dbfv_encrypt_poly_sk(jax.random.PRNGKey(80 + trial), pb, sk,
                                    params)
        got = dbfv_decrypt_poly(dbfv_mul(ct_a, ct_b, rlk), sk)
        want = negacyclic_mul_host([int(x) for x in pa], [int(x) for x in pb],
                                   256)
        assert [int(x) for x in np.asarray(got).reshape(-1)] == want, trial
