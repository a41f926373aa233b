"""Narrow-basis engine tests: roundtrips, add, u64 dBFV multiply."""

import numpy as np
import jax
import pytest

from exacto_tpu import narrow as nr


@pytest.fixture(scope="module")
def mini():
    """u64-capability narrow params on n=16 (2 Q-primes, 4 aux primes)."""
    n = 16
    qs = nr.find_narrow_primes(n, 2, 31)
    ps = nr.find_narrow_primes(n, 4, 29, skip=qs)
    bfv = nr.NarrowParams.create(n, 1040407, qs, ps, gadget_base=256)
    params = nr.NarrowDbfvParams(base=256, num_digits=8, plain_modulus=0, bfv=bfv)
    sk = nr.gen_secret_key(jax.random.PRNGKey(1), bfv)
    rlk = nr.gen_relin_key(jax.random.PRNGKey(2), sk)
    return params, sk, rlk


def test_narrow_bfv_roundtrip(mini):
    params, sk, _ = mini
    bfv = params.bfv
    n = bfv.ring_degree
    coeffs = np.zeros((3, n), dtype=np.uint64)
    coeffs[:, 0] = [0, 42, 1040406]
    ct = nr.encrypt_sk(jax.random.PRNGKey(5), coeffs, sk)
    dec = nr.decrypt(ct, sk)
    np.testing.assert_array_equal(dec[:, 0], coeffs[:, 0])


def test_narrow_dbfv_roundtrip_add(mini):
    params, sk, _ = mini
    vals = np.array([0, 3, 2**64 - 1, 0xDEADBEEFCAFEBABE], dtype=np.uint64)
    ct = nr.dbfv_encrypt_sk(jax.random.PRNGKey(7), vals, sk, params)
    got = nr.dbfv_decrypt(ct, sk)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.uint64), vals)

    ct2 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(8), vals[::-1].copy(), sk, params)
    got2 = nr.dbfv_decrypt(nr.dbfv_add(ct, ct2), sk)
    np.testing.assert_array_equal(np.asarray(got2, dtype=np.uint64),
                                  vals + vals[::-1])


def test_narrow_dbfv_mul_u64(mini):
    params, sk, rlk = mini
    a = np.array([3, 0xDEADBEEFCAFEBABE, 2**64 - 1], dtype=np.uint64)
    b = np.array([7, 0x123456789ABCDEF, 2**64 - 1], dtype=np.uint64)
    ct1 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(11), a, sk, params)
    ct2 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(12), b, sk, params)
    prod = nr.dbfv_mul(ct1, ct2, rlk)
    got = nr.dbfv_decrypt(prod, sk)
    want = (a.astype(object) * b.astype(object)) % (1 << 64)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.uint64).astype(object),
                                  want)


def test_narrow_pk_encrypt_and_mul(mini):
    params, sk, rlk = mini
    pk = nr.gen_public_key(jax.random.PRNGKey(20), sk)
    vals = np.array([5, 123456789012345], dtype=np.uint64)
    ct = nr.dbfv_encrypt(jax.random.PRNGKey(21), vals, pk, params)
    got = nr.dbfv_decrypt(ct, sk)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.uint64), vals)

    ct2 = nr.dbfv_encrypt(jax.random.PRNGKey(22), vals[::-1].copy(), pk, params)
    prod = nr.dbfv_mul(ct, ct2, rlk)
    want = (vals.astype(object) * vals[::-1].astype(object)) % (1 << 64)
    got2 = nr.dbfv_decrypt(prod, sk)
    np.testing.assert_array_equal(
        np.asarray(got2, dtype=np.uint64).astype(object), want)


def test_narrow_sub_neg_automorphism(mini):
    params, sk, rlk = mini
    a = np.array([100, 2**40], dtype=np.uint64)
    b = np.array([30, 7], dtype=np.uint64)
    ct1 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(31), a, sk, params)
    ct2 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(32), b, sk, params)
    got = nr.dbfv_decrypt(nr.dbfv_sub(ct1, ct2), sk)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.uint64), a - b)
    got2 = nr.dbfv_decrypt(nr.dbfv_neg(ct2), sk)
    np.testing.assert_array_equal(np.asarray(got2, dtype=np.uint64), (-b) % (1 << 64) if False else (0 - b))

    gk = nr.gen_galois_key(jax.random.PRNGKey(33), sk, 3)
    got3 = nr.dbfv_decrypt(nr.dbfv_apply_automorphism(ct1, gk), sk)
    np.testing.assert_array_equal(np.asarray(got3, dtype=np.uint64), a)


@pytest.fixture(scope="module")
def compact_narrow():
    """compact_dbfv capability on the narrow engine: b=16, d=2, p=256."""
    n = 16
    qs = nr.find_narrow_primes(n, 2, 31)
    ps = nr.find_narrow_primes(n, 3, 31, skip=qs)
    bfv = nr.NarrowParams.create(n, 929, qs, ps, gadget_base=256)
    params = nr.NarrowDbfvParams(base=16, num_digits=2, plain_modulus=256,
                                 bfv=bfv)
    sk = nr.gen_secret_key(jax.random.PRNGKey(41), bfv)
    return params, sk


def test_narrow_div_by_base(compact_narrow):
    params, sk = compact_narrow
    ct = nr.dbfv_encrypt_sk(jax.random.PRNGKey(42),
                            np.array([48], dtype=np.uint64), sk, params)
    ct_div = nr.dbfv_div_by_base(ct)
    assert ct_div.params.plain_modulus == 16
    got = nr.dbfv_decrypt(ct_div, sk)
    assert int(np.asarray(got)[0]) == 3


def test_narrow_change_base(compact_narrow):
    params, sk = compact_narrow
    for v in [0, 42, 255]:
        ct = nr.dbfv_encrypt_sk(jax.random.PRNGKey(100 + v),
                                np.array([v], dtype=np.uint64), sk, params)
        ct4 = nr.dbfv_change_base(ct, 4, 4)
        assert ct4.params.base == 4 and ct4.params.num_digits == 4
        got = nr.dbfv_decrypt(ct4, sk)
        assert int(np.asarray(got)[0]) == v


@pytest.mark.slow
def test_narrow_bootstrap_chain():
    """Narrow dBFV mul-then-bootstrap via the wide-host bridge."""
    from exacto_tpu import narrow_bridge as nb
    from exacto_tpu.params import BfvParamsBuilder

    n = 16
    qs = nr.find_narrow_primes(n, 2, 31)
    ps = nr.find_narrow_primes(n, 3, 31, skip=qs)
    bfv = nr.NarrowParams.create(n, 5, qs, ps, gadget_base=256)
    params = nr.NarrowDbfvParams(base=2, num_digits=2, plain_modulus=4,
                                 bfv=bfv)
    boot_bfv = (BfvParamsBuilder().ring_degree(n).plain_modulus(97)
                .ct_moduli([1125899906842817, 1125899906843009,
                            1125899906843233, 1125899906843617])
                .sigma(3.2).gadget_base(256).build())

    k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(777), 5)
    sk = nr.gen_secret_key(k1, bfv, hamming_weight=2)
    rlk = nr.gen_relin_key(k2, sk)
    bsk = nb.gen_bootstrap_key_narrow(k3, sk, boot_bfv, 25)

    ct1 = nr.dbfv_encrypt_sk(k4, np.array([3], dtype=np.uint64), sk, params)
    ct2 = nr.dbfv_encrypt_sk(k5, np.array([2], dtype=np.uint64), sk, params)

    prod = nb.dbfv_mul_then_bootstrap_narrow(ct1, ct2, rlk, bsk)
    assert prod.mul_depth == 0
    assert int(np.asarray(nr.dbfv_decrypt(prod, sk))[0]) == (3 * 2) % 4

    chain = nb.dbfv_mul_chain_then_bootstrap_narrow([ct1, ct2, ct1], rlk, bsk)
    assert int(np.asarray(nr.dbfv_decrypt(chain, sk))[0]) == (3 * 2 * 3) % 4
