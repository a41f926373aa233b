"""General-L narrow engine: Garner mixed-radix glue + RNS-digit keyswitch.

Round 1 hard-wired the narrow engine to exactly 2 ciphertext primes (the
u64-pair CRT compose).  These tests exercise the general-L path (3 Q-primes
here): exact centered base extension, the split HPS scale
round(t*x/Q) = t*m + r, CRT-digit key-switching, and the end-to-end
encrypt -> multiply -> decrypt parity that depends on all of them.
"""

import numpy as np
import jax
import pytest

from exacto_tpu import narrow as nr
from exacto_tpu.ring import hostmath as hm


N = 256


@pytest.fixture(scope="module")
def params3():
    qs = nr.find_narrow_primes(N, 3, 30)
    ps = nr.find_narrow_primes(N, 4, 30, skip=qs)
    return nr.NarrowParams.create(N, 929, qs, ps)


@pytest.fixture(scope="module")
def keys3(params3):
    sk = nr.gen_secret_key(jax.random.PRNGKey(1), params3)
    rlk = nr.gen_relin_key(jax.random.PRNGKey(2), sk)
    return sk, rlk


def test_gadget_mode_auto(params3):
    assert params3.gadget_mode == "rns"
    assert params3.gadget_digits == 3


def test_base_mode_rejects_three_primes():
    qs = nr.find_narrow_primes(N, 3, 30)
    ps = nr.find_narrow_primes(N, 1, 30, skip=qs)
    with pytest.raises(Exception):
        nr.NarrowParams.create(N, 929, qs, ps, gadget_mode="base")


def test_garner_digits_roundtrip(params3):
    """Garner digits recompose to the CRT value; sign matches x > Q/2."""
    moduli = params3.moduli
    big = params3.big_q
    rng = np.random.default_rng(0)
    xs = [int(v) for v in rng.integers(0, 1 << 63, 64, dtype=np.uint64)]
    xs += [0, 1, big // 2, big // 2 + 1, big - 1]
    res = np.zeros((len(xs), len(moduli), 1), dtype=np.uint32)
    for k, x in enumerate(xs):
        for i, m in enumerate(moduli):
            res[k, i, 0] = x % m
    vs, neg = nr._garner_digits(moduli, jax.numpy.asarray(res))
    vs = [np.asarray(v) for v in vs]
    neg = np.asarray(neg)
    for k, x in enumerate(xs):
        want = x % big
        got = 0
        mult = 1
        for j, m in enumerate(moduli):
            got += int(vs[j][k, 0]) * mult
            mult *= m
        assert got == want, k
        assert bool(neg[k, 0]) == (want > big // 2), k


def test_horner_centered_extension(params3):
    moduli = params3.moduli
    big = params3.big_q
    p = params3.aux_moduli[0]
    rng = np.random.default_rng(1)
    xs = [int(v) % big for v in rng.integers(0, 1 << 63, 64, dtype=np.uint64)]
    xs += [0, big // 2, big // 2 + 1, big - 1]
    res = np.zeros((len(xs), len(moduli), 1), dtype=np.uint32)
    for k, x in enumerate(xs):
        for i, m in enumerate(moduli):
            res[k, i, 0] = x % m
    vs, neg = nr._garner_digits(moduli, jax.numpy.asarray(res))
    out = np.asarray(nr._horner_mod(moduli, vs, neg, p))
    for k, x in enumerate(xs):
        centered = x if x <= big // 2 else x - big
        assert int(out[k, 0]) == centered % p, k


def test_encrypt_decrypt_roundtrip_L3(params3, keys3):
    sk, _ = keys3
    vals = np.array([0, 1, 900, 928], dtype=np.uint64)
    coeffs = np.zeros((4, N), dtype=np.uint64)
    coeffs[:, 0] = vals
    ct = nr.encrypt_sk(jax.random.PRNGKey(3), coeffs, sk)
    got = nr.decrypt(ct, sk)
    np.testing.assert_array_equal(np.asarray(got)[:, 0], vals)


@pytest.mark.slow
def test_bfv_mul32_L3(params3, keys3):
    """Single-ct multiply with 3-prime Q: general HPS scale + RNS-digit
    relinearization, checked against scalar arithmetic mod t."""
    sk, rlk = keys3
    t = params3.plain_modulus
    a = np.array([7, 123, 555, 928], dtype=np.uint64)
    b = np.array([3, 515, 700, 928], dtype=np.uint64)
    ca = np.zeros((4, N), dtype=np.uint64)
    cb = np.zeros((4, N), dtype=np.uint64)
    ca[:, 0] = a
    cb[:, 0] = b
    ct_a = nr.encrypt_sk(jax.random.PRNGKey(4), ca, sk)
    ct_b = nr.encrypt_sk(jax.random.PRNGKey(5), cb, sk)
    out = nr.bfv_mul32(ct_a, ct_b, rlk)
    got = np.asarray(nr.decrypt(out, sk))[:, 0]
    np.testing.assert_array_equal(got, (a * b) % t)


def test_ct_linear_ops_L3(params3, keys3):
    sk, _ = keys3
    a = np.array([100, 800], dtype=np.uint64)
    b = np.array([50, 200], dtype=np.uint64)
    t = params3.plain_modulus
    ca = np.zeros((2, N), dtype=np.uint64)
    cb = np.zeros((2, N), dtype=np.uint64)
    ca[:, 0] = a
    cb[:, 0] = b
    ct_a = nr.encrypt_sk(jax.random.PRNGKey(6), ca, sk)
    ct_b = nr.encrypt_sk(jax.random.PRNGKey(7), cb, sk)
    np.testing.assert_array_equal(
        np.asarray(nr.decrypt(nr.ct_add(ct_a, ct_b), sk))[:, 0], (a + b) % t)
    np.testing.assert_array_equal(
        np.asarray(nr.decrypt(nr.ct_sub(ct_a, ct_b), sk))[:, 0], (a - b) % t)
    np.testing.assert_array_equal(
        np.asarray(nr.decrypt(nr.ct_scalar_mul(ct_a, 7), sk))[:, 0],
        (a * 7) % t)
    triv = nr.trivial_encrypt(ca, params3)
    np.testing.assert_array_equal(
        np.asarray(nr.decrypt(nr.ct_add(ct_b, triv), sk))[:, 0], (a + b) % t)


@pytest.mark.slow
def test_automorphism_L3(params3, keys3):
    """Galois automorphism + RNS-digit keyswitch at L=3: sigma_k on a
    polynomial plaintext matches the host model."""
    sk, _ = keys3
    elt = 5
    gk = nr.gen_galois_key(jax.random.PRNGKey(8), sk, elt)
    t = params3.plain_modulus
    coeffs = np.zeros((1, N), dtype=np.uint64)
    coeffs[0, :4] = [1, 2, 3, 4]
    ct = nr.encrypt_sk(jax.random.PRNGKey(9), coeffs, sk)
    out = nr.apply_automorphism(ct, gk)
    got = np.asarray(nr.decrypt(out, sk))[0]
    # host model: X^i -> +-X^{(i*elt) mod 2n}
    want = np.zeros(N, dtype=np.uint64)
    for i in range(N):
        if coeffs[0, i] == 0:
            continue
        e = (i * elt) % (2 * N)
        v = int(coeffs[0, i])
        if e >= N:
            e -= N
            v = (-v) % t
        want[e] = (want[e] + v) % t
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_dbfv_d4_large_t_roundtrip():
    """d=4 / b=2^16 u64 profile at test scale: t = 2^35-1 exceeds one aux
    prime, so the HPS round term lifts through a 2-prime CRT pair
    (ROADMAP item 5; reference paper profile 1, paper_repro.rs:43-66).

    Sparse secret (h=64): the dominant post-mul noise at this t is the HPS
    rounding term ~ (t/2)*||s||_1, so a dense ternary secret (||s||_1 ~
    2n/3) sits exactly at the Delta/2 boundary — h=64 pulls it 5+ bits
    under (measured: dense flips one digit on ~2/5 seeds; h=64 is clean
    across seeds)."""
    n = 256
    qs = nr.find_narrow_primes(n, 3, 30)
    ps = nr.find_narrow_primes(n, 4, 30, skip=qs)
    bfv = nr.NarrowParams.create(n, (1 << 35) - 1, qs, ps, gadget_mode="rns")
    params = nr.NarrowDbfvParams(base=1 << 16, num_digits=4,
                                 plain_modulus=0, bfv=bfv)
    sk = nr.gen_secret_key(jax.random.PRNGKey(11), bfv, hamming_weight=64)
    rlk = nr.gen_relin_key(jax.random.PRNGKey(12), sk)
    a = np.array([0xDEADBEEFCAFEBABE, 3, (1 << 64) - 1], dtype=np.uint64)
    b = np.array([0x0123456789ABCDEF, 5, (1 << 64) - 1], dtype=np.uint64)
    ct1 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(13), a, sk, params)
    ct2 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(14), b, sk, params)
    got = np.asarray(nr.dbfv_decrypt(nr.dbfv_mul(ct1, ct2, rlk), sk),
                     dtype=np.uint64)
    np.testing.assert_array_equal(got, a * b)  # uint64 wrap == mod 2^64
    got_add = np.asarray(nr.dbfv_decrypt(nr.dbfv_add(ct1, ct2), sk),
                         dtype=np.uint64)
    np.testing.assert_array_equal(got_add, a + b)


def test_general_hps_matches_pair_path_L2():
    """At L=2 the general Garner HPS scale must agree bit-for-bit with the
    u64-pair fast path on real tensor data."""
    qs = nr.find_narrow_primes(N, 2, 30)
    ps = nr.find_narrow_primes(N, 3, 30, skip=qs)
    params = nr.NarrowParams.create(N, 929, qs, ps)
    sk = nr.gen_secret_key(jax.random.PRNGKey(10), params)
    coeffs = np.zeros((2, N), dtype=np.uint64)
    coeffs[:, 0] = [123, 456]
    ct = nr.encrypt_sk(jax.random.PRNGKey(11), coeffs, sk)
    t_q = nr.np_mul(params.ct_basis, ct.c0, ct.c1)
    e0 = nr._extend_to_aux(params, ct.c0, res=ct.c0c)
    e1 = nr._extend_to_aux(params, ct.c1, res=ct.c1c)
    t_p = nr.np_mul(params.aux_basis, e0, e1)
    a = nr._narrow_hps_scale(params, t_q, t_p)
    b = nr._narrow_hps_scale_general(params, t_q, t_p)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the general extension agrees with the pair-compose extension
    g = nr._extend_to_aux_general(params, ct.c0, res=ct.c0c)
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(g))
