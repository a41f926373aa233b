"""Exactness tests for 32-bit-lane wide arithmetic against Python bigints.

Mirrors the reference's oracle-test pattern (NTT vs schoolbook,
/root/reference/src/ring/ntt.rs:181-195): every emulated op is checked
against exact Python integer arithmetic on random and adversarial inputs.
"""

import numpy as np
import jax.numpy as jnp

from exacto_tpu.ring import wordops as w
from exacto_tpu.ring import hostmath as hm


def pairs_from(vals):
    lo, hi = w.to_pair_np(np.array(vals, dtype=np.uint64))
    return jnp.asarray(lo), jnp.asarray(hi)


def ints_from(pair):
    return [int(v) for v in w.from_pair_np(np.asarray(pair[0]), np.asarray(pair[1]))]


EDGE = [0, 1, 2, 0xFFFFFFFF, 0x100000000, 0xFFFFFFFFFFFFFFFF,
        0x8000000000000000, 0x00000001FFFFFFFF, 0xDEADBEEFCAFEBABE]


def rand_u64(rng, k=64):
    return [int(x) for x in rng.integers(0, 1 << 63, size=k, dtype=np.uint64) * 2
            + rng.integers(0, 2, size=k, dtype=np.uint64)]


def test_mul32_exact(rng):
    a = rng.integers(0, 1 << 32, size=256, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, size=256, dtype=np.uint64).astype(np.uint32)
    lo, hi = w.mul32(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(lo).astype(np.uint64) | (np.asarray(hi).astype(np.uint64) << np.uint64(32))
    want = a.astype(np.uint64) * b.astype(np.uint64)
    np.testing.assert_array_equal(got, want)


def test_add_sub_shift_cmp(rng):
    xs = EDGE + rand_u64(rng)
    ys = list(reversed(EDGE)) + rand_u64(rng)
    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    a, b = pairs_from(xs), pairs_from(ys)
    M = 1 << 64
    assert ints_from(w.add64(a, b)) == [(x + y) % M for x, y in zip(xs, ys)]
    assert ints_from(w.sub64(a, b)) == [(x - y) % M for x, y in zip(xs, ys)]
    np.testing.assert_array_equal(np.asarray(w.ge64(a, b)),
                                  np.array([x >= y for x, y in zip(xs, ys)]))
    np.testing.assert_array_equal(np.asarray(w.gt64(a, b)),
                                  np.array([x > y for x, y in zip(xs, ys)]))
    for k in (0, 1, 13, 31, 32, 33, 63):
        assert ints_from(w.shr64(a, k)) == [x >> k for x in xs], f"shr {k}"
        assert ints_from(w.shl64(a, k)) == [(x << k) % M for x in xs], f"shl {k}"


def test_mul64_and_lowmul(rng):
    xs = EDGE + rand_u64(rng)
    ys = list(reversed(EDGE)) + rand_u64(rng)
    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    a, b = pairs_from(xs), pairs_from(ys)
    prod = w.mul64(a, b)
    for i in range(n):
        got = sum(int(np.asarray(prod[j])[i]) << (32 * j) for j in range(4))
        assert got == xs[i] * ys[i], f"mul64 mismatch at {i}"
    low = w.lowmul64(a, b)
    assert ints_from(low) == [(x * y) % (1 << 64) for x, y in zip(xs, ys)]


def test_add_sub_128(rng):
    k = 32
    xs = [int.from_bytes(rng.bytes(16), "little") for _ in range(k)]
    ys = [int.from_bytes(rng.bytes(16), "little") for _ in range(k)]
    M = 1 << 128

    def tup(vals):
        return tuple(jnp.asarray(np.array([(v >> (32 * j)) & 0xFFFFFFFF for v in vals],
                                          dtype=np.uint32)) for j in range(4))

    def untup(t):
        return [sum(int(np.asarray(t[j])[i]) << (32 * j) for j in range(4)) for i in range(k)]

    a, b = tup(xs), tup(ys)
    assert untup(w.add128(a, b)) == [(x + y) % M for x, y in zip(xs, ys)]
    assert untup(w.sub128(a, b)) == [(x - y) % M for x, y in zip(xs, ys)]
    np.testing.assert_array_equal(np.asarray(w.ge128(a, b)),
                                  np.array([x >= y for x, y in zip(xs, ys)]))


def test_mul64x128(rng):
    k = 16
    xs = rand_u64(rng, k)
    ts = [int.from_bytes(rng.bytes(16), "little") for _ in range(k)]
    a = pairs_from(xs)
    t = tuple(jnp.asarray(np.array([(v >> (32 * j)) & 0xFFFFFFFF for v in ts],
                                   dtype=np.uint32)) for j in range(4))
    out = w.mul64x128(a, t)
    for i in range(k):
        got = sum(int(np.asarray(out[j])[i]) << (32 * j) for j in range(6))
        assert got == xs[i] * ts[i]


MODULI = [
    1099509805057,        # 40-bit compact prime
    562949953443841,      # 50-bit aux prime
    1152921504606830593,  # 60-bit u64_dbfv prime
    18014398509998081,    # 54-bit aux
    36028797018972161,    # 55-bit aux
    65537,                # tiny Fermat prime
    929,
]


def test_montgomery_roundtrip_and_mul(rng):
    for q in MODULI:
        qinv = hm.montgomery_inv_neg(q)
        r1, r2 = hm.mont_r1(q), hm.mont_r2(q)
        xs = [x % q for x in rand_u64(rng, 48)] + [0, 1, q - 1, q // 2, q // 2 + 1]
        ys = [y % q for y in rand_u64(rng, 48)] + [q - 1, 1, 0, q - 1, 7 % q]
        n = len(xs)
        a, b = pairs_from(xs), pairs_from(ys)
        qp = w.const_pair(q)
        qinvp = w.const_pair(qinv)
        r1p, r2p = w.const_pair(r1), w.const_pair(r2)

        # to_mont/from_mont roundtrip
        am = w.to_mont(a, qp, qinvp, r2p)
        assert ints_from(am) == [x * (1 << 64) % q for x in xs]
        back = w.from_mont(am, qp, qinvp)
        assert ints_from(back) == xs

        # modmul via Montgomery domain
        bm = w.to_mont(b, qp, qinvp, r2p)
        prod = w.from_mont(w.mont_mul(am, bm, qp, qinvp), qp, qinvp)
        assert ints_from(prod) == [x * y % q for x, y in zip(xs, ys)]

        # raw reduction of arbitrary u64 / u128
        zs = rand_u64(rng, n)
        z = pairs_from(zs)
        red = w.mod_from_u64(z, qp, qinvp, r1p)
        assert ints_from(red) == [v % q for v in zs]

        t128 = [int.from_bytes(rng.bytes(16), "little") for _ in range(n)]
        t = tuple(jnp.asarray(np.array([(v >> (32 * j)) & 0xFFFFFFFF for v in t128],
                                       dtype=np.uint32)) for j in range(4))
        red128 = w.mod_from_u128(t, qp, qinvp, r1p, r2p)
        assert ints_from(red128) == [v % q for v in t128]

        # add/sub/neg
        assert ints_from(w.mod_add64(a, b, qp)) == [(x + y) % q for x, y in zip(xs, ys)]
        assert ints_from(w.mod_sub64(a, b, qp)) == [(x - y) % q for x, y in zip(xs, ys)]
        assert ints_from(w.mod_neg64(a, qp)) == [(-x) % q for x in xs]


def test_hostmath_basics():
    assert hm.is_prime(1152921504606830593)
    assert hm.is_prime(1099509805057)
    assert not hm.is_prime(1 << 40)
    assert hm.mod_inv(3, 7) == 5
    q, n = 1152921504606830593, 4096
    psi = hm.psi_2n(q, n)
    assert pow(psi, 2 * n, q) == 1
    assert pow(psi, n, q) == q - 1
    # CRT
    mods = [1099509805057, 562949953443841]
    x = 123456789123456789
    res = [x % m for m in mods]
    assert hm.crt_reconstruct(res, mods) == x
