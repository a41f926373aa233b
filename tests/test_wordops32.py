"""Narrow (single-u32) Montgomery + NTT path vs Python-int oracles."""

import numpy as np
import jax.numpy as jnp

from exacto_tpu.ring import wordops32 as w32
from exacto_tpu.ring import hostmath as hm
from exacto_tpu.ring import ntt as nttmod


def narrow_primes(n, count):
    """NTT-friendly primes just under 2^31 for ring degree n."""
    out = []
    k = ((1 << 31) - 1) // (2 * n) * (2 * n) + 1
    while len(out) < count and k > 1 << 28:
        if hm.is_prime(k):
            out.append(k)
        k -= 2 * n
    assert len(out) == count
    return out


def test_mont_mul32_exact(rng):
    for q in narrow_primes(64, 3) + [12289, 40961]:
        c = w32.mont_consts32(q)
        a = rng.integers(0, q, 256, dtype=np.uint32)
        b = rng.integers(0, q, 256, dtype=np.uint32)
        am = w32.to_mont32(jnp.asarray(a), q, c["qinv_neg"], c["r2"])
        bm = w32.to_mont32(jnp.asarray(b), q, c["qinv_neg"], c["r2"])
        prod = w32.from_mont32(w32.mont_mul32(am, bm, q, c["qinv_neg"]),
                               q, c["qinv_neg"])
        want = (a.astype(object) * b.astype(object)) % q
        np.testing.assert_array_equal(np.asarray(prod).astype(object), want)

        # add/sub/neg
        np.testing.assert_array_equal(
            np.asarray(w32.mod_add32(jnp.asarray(a), jnp.asarray(b), q)),
            (a.astype(np.uint64) + b) % q)
        np.testing.assert_array_equal(
            np.asarray(w32.mod_sub32(jnp.asarray(a), jnp.asarray(b), q)),
            (a.astype(np.int64) - b) % q)

        # u64 pair reduction
        vals = rng.integers(0, 1 << 63, 64, dtype=np.uint64)
        lo = (vals & 0xFFFFFFFF).astype(np.uint32)
        hi = (vals >> 32).astype(np.uint32)
        red = w32.reduce_u64_pair32(jnp.asarray(lo), jnp.asarray(hi),
                                    q, c["qinv_neg"], c["r1"], c["r2"])
        np.testing.assert_array_equal(np.asarray(red).astype(np.uint64), vals % q)


def test_ntt32_roundtrip_and_oracle(rng):
    n = 64
    moduli = narrow_primes(n, 2)
    L = len(moduli)
    consts = [w32.mont_consts32(q) for q in moduli]
    q = jnp.asarray(np.array(moduli, dtype=np.uint32))
    qinv = jnp.asarray(np.array([c["qinv_neg"] for c in consts], dtype=np.uint32))
    tabs = [w32.build_psi_tables32(m, n) for m in moduli]
    psi = jnp.asarray(np.stack([t["psi_rev"] for t in tabs]))
    ipsi = jnp.asarray(np.stack([t["ipsi_rev"] for t in tabs]))
    ninv = jnp.asarray(np.array([t["ninv"] for t in tabs], dtype=np.uint32))

    coeffs = np.zeros((3, L, n), dtype=np.uint32)
    for b in range(3):
        for li, m in enumerate(moduli):
            coeffs[b, li] = rng.integers(0, m, n, dtype=np.uint32)

    # to Montgomery form
    xm = coeffs.copy()
    for li, (m, c) in enumerate(zip(moduli, consts)):
        xm[:, li] = (coeffs[:, li].astype(np.uint64) * c["r1"] % m).astype(np.uint32)

    fwd = w32.ntt_fwd32(jnp.asarray(xm), psi, q, qinv)
    # de-Montgomery and compare against the host oracle
    fwd_std = np.asarray(fwd)
    for li, (m, c) in enumerate(zip(moduli, consts)):
        inv_r = hm.mod_inv(1 << 32, m)
        got = (fwd_std[:, li].astype(np.uint64) * inv_r % m)
        for b in range(3):
            want = nttmod.ntt_host([int(v) for v in coeffs[b, li]], m)
            assert [int(v) for v in got[b]] == want, (b, li)

    back = w32.ntt_inv32(fwd, ipsi, ninv, q, qinv)
    np.testing.assert_array_equal(np.asarray(back), xm)
