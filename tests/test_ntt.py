"""NTT correctness: roundtrip, convolution vs schoolbook oracle, orderings.

Mirrors the reference's NTT tests (/root/reference/src/ring/ntt.rs:169-212)
plus checks specific to our eval-domain tricks (exponent table, automorphism
permutation).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from exacto_tpu.ring import hostmath as hm
from exacto_tpu.ring import ntt
from exacto_tpu.ring import poly as hpoly
from exacto_tpu.ring import wordops as w


def make_consts(moduli):
    q = w.to_pair_np(np.array(moduli, dtype=np.uint64))
    qinv = w.to_pair_np(np.array([hm.montgomery_inv_neg(m) for m in moduli], dtype=np.uint64))
    r2 = w.to_pair_np(np.array([hm.mont_r2(m) for m in moduli], dtype=np.uint64))
    return tuple(map(jnp.asarray, q)), tuple(map(jnp.asarray, qinv)), tuple(map(jnp.asarray, r2))


def make_tables(moduli, n):
    tabs = [ntt.build_psi_tables(q, n) for q in moduli]
    psi = w.to_pair_np(np.stack([t["psi_rev"] for t in tabs]))
    ipsi = w.to_pair_np(np.stack([t["ipsi_rev"] for t in tabs]))
    ninv = w.to_pair_np(np.array([t["ninv"] for t in tabs], dtype=np.uint64))
    j = jnp.asarray
    return (j(psi[0]), j(psi[1])), (j(ipsi[0]), j(ipsi[1])), (j(ninv[0]), j(ninv[1]))


def to_device_mont(coeffs_per_prime, q, qinv, r2):
    """[L, n] int matrix (values < q_i) -> Montgomery (lo, hi) pair."""
    lo, hi = w.to_pair_np(np.array(coeffs_per_prime, dtype=np.uint64))
    pair = (jnp.asarray(lo), jnp.asarray(hi))
    qb = (q[0][:, None], q[1][:, None])
    qib = (qinv[0][:, None], qinv[1][:, None])
    r2b = (r2[0][:, None], r2[1][:, None])
    return w.to_mont(pair, qb, qib, r2b)


def from_device_mont(x, q, qinv):
    qb = (q[0][:, None], q[1][:, None])
    qib = (qinv[0][:, None], qinv[1][:, None])
    std = w.from_mont(x, qb, qib)
    return w.from_pair_np(np.asarray(std[0]), np.asarray(std[1]))


MODULI = [1099509805057, 562949953443841, 65537]


def test_host_ntt_roundtrip_and_conv(rng):
    n, q = 16, 65537
    a = [int(x) for x in rng.integers(0, q, n)]
    b = [int(x) for x in rng.integers(0, q, n)]
    assert ntt.intt_host(ntt.ntt_host(a, q), q) == a
    prod_ntt = [x * y % q for x, y in zip(ntt.ntt_host(a, q), ntt.ntt_host(b, q))]
    assert ntt.intt_host(prod_ntt, q) == hpoly.negacyclic_mul_host(a, b, q)


@pytest.mark.slow
def test_device_ntt_matches_host(rng):
    for n in (4, 16, 64, 256):
        moduli = [m for m in MODULI if (m - 1) % (2 * n) == 0]
        assert moduli, n
        q, qinv, r2 = make_consts(moduli)
        psi, ipsi, ninv = make_tables(moduli, n)
        coeffs = [[int(x) for x in rng.integers(0, m, n)] for m in moduli]
        x = to_device_mont(coeffs, q, qinv, r2)

        fwd = ntt.ntt_fwd(x, psi, q, qinv)
        got = from_device_mont(fwd, q, qinv)
        for li, m in enumerate(moduli):
            want = ntt.ntt_host(coeffs[li], m)
            assert [int(v) for v in got[li]] == want, f"n={n} q={m} fwd mismatch"

        back = ntt.ntt_inv(fwd, ipsi, ninv, q, qinv)
        rec = from_device_mont(back, q, qinv)
        for li in range(len(moduli)):
            assert [int(v) for v in rec[li]] == coeffs[li], f"n={n} roundtrip"


def test_device_ntt_batched_jit(rng):
    n, moduli = 64, MODULI[:2]
    q, qinv, r2 = make_consts(moduli)
    psi, ipsi, ninv = make_tables(moduli, n)
    batch = 3
    coeffs = np.array([[[int(x) for x in rng.integers(0, m, n)] for m in moduli]
                       for _ in range(batch)], dtype=object)

    # build batched input [batch, L, n]
    arr = np.zeros((batch, len(moduli), n), dtype=np.uint64)
    for bi in range(batch):
        for li in range(len(moduli)):
            arr[bi, li] = coeffs[bi, li]
    lo, hi = w.to_pair_np(arr)
    pair = (jnp.asarray(lo), jnp.asarray(hi))
    qb = (q[0][:, None], q[1][:, None])
    qib = (qinv[0][:, None], qinv[1][:, None])
    r2b = (r2[0][:, None], r2[1][:, None])
    xm = w.to_mont(pair, qb, qib, r2b)

    fwd_fn = jax.jit(lambda v: ntt.ntt_fwd(v, psi, q, qinv))
    inv_fn = jax.jit(lambda v: ntt.ntt_inv(v, ipsi, ninv, q, qinv))
    back = inv_fn(fwd_fn(xm))
    std = w.from_mont(back, qb, qib)
    rec = w.from_pair_np(np.asarray(std[0]), np.asarray(std[1]))
    np.testing.assert_array_equal(rec, arr)


def test_eval_exponents_and_automorphism(rng):
    n, q = 16, 65537
    exps = ntt.eval_exponents(n)
    assert sorted(exps) == list(range(1, 2 * n, 2))
    a = [int(x) for x in rng.integers(0, q, n)]
    evals = ntt.ntt_host(a, q)
    psi = hm.psi_2n(q, n)

    # output j is a(psi^{e_j})
    for j, e in enumerate(exps):
        val = sum(c * pow(psi, e * i, q) for i, c in enumerate(a)) % q
        assert evals[j] == val

    # eval-domain automorphism permutation == coeff-domain automorphism
    for k in (3, 5, 2 * n - 1):
        perm = ntt.automorphism_perm(n, k)
        permuted = [evals[perm[j]] for j in range(n)]
        direct = ntt.ntt_host(hpoly.automorphism_host(a, k, q), q)
        assert permuted == direct, f"k={k}"
