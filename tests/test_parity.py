"""Parity-tier tests: the ChaCha20 reference-RNG harness (exacto_tpu.parity).

Validates three layers:
  1. the ChaCha20 block function against the RFC 8439 test vector,
  2. the rand_core BlockRng word semantics (straddle rule) and the
     seed_from_u64 PCG32 filler against their specified algorithms,
  3. the full sampled-key/ciphertext pipeline against an independent
     pure-Python big-int oracle of the reference's arithmetic
     (/root/reference/src/bfv/encrypt.rs:79-106): same RNG stream in,
     bit-identical ciphertext residues out.
"""

import numpy as np
import pytest

from exacto_tpu import parity
from exacto_tpu.parity import ChaCha20Rng


# ---------------------------------------------------------------------------
# layer 1: ChaCha20 core vs RFC 8439 section 2.3.2
# ---------------------------------------------------------------------------

def test_chacha20_block_rfc8439():
    key = [int.from_bytes(bytes(range(4 * i, 4 * i + 4)), "little")
           for i in range(8)]
    # counter = 1; nonce = 00 00 00 09 / 00 00 00 4a / 00 00 00 00
    out = parity.chacha20_block(key, (1, 0x09000000), (0x4A000000, 0))
    expected = [
        0xE4E7F110, 0x15593BD1, 0x1FDD0F50, 0xC47120A3,
        0xC7F4D1C7, 0x0368C033, 0x9AAA2204, 0x4E6CD4C3,
        0x466482D2, 0x09AA9F07, 0x05D7C214, 0xA2028BD9,
        0xD19C12B5, 0xB94E16DE, 0xE883D0CB, 0x4E3C50A2,
    ]
    assert out == expected


def test_chacha20_counter_advances():
    rng = ChaCha20Rng(bytes(32))
    words = [rng.next_u32() for _ in range(80)]  # crosses one 64-word refill
    # block 0 of the all-zero key/nonce stream (well-known vector)
    assert words[0] == 0xADE0B876
    # refill must continue the block counter, not restart it
    assert words[:16] != words[64:80]


def test_blockrng_u64_straddle():
    # consume 63 words, then a u64: low half = word 63, high half = word 0'
    a = ChaCha20Rng(bytes(32))
    b = ChaCha20Rng(bytes(32))
    wa = [a.next_u32() for _ in range(64)]
    wa += [a.next_u32() for _ in range(64)]
    for _ in range(63):
        b.next_u32()
    v = b.next_u64()
    assert v == (wa[63] | (wa[64] << 32))
    # after the straddle, index resumes at word 1 of the new buffer
    assert b.next_u32() == wa[65]


def test_seed_from_u64_filler():
    # PCG32 filler, computed independently with python ints
    MUL, INC = 6364136223846793005, 11634580027462260723
    state = 42
    seed = b""
    for _ in range(8):
        state = (state * MUL + INC) % (1 << 64)
        x = (((state >> 18) ^ state) >> 27) & 0xFFFFFFFF
        r = state >> 59
        x = ((x >> r) | (x << ((32 - r) & 31))) & 0xFFFFFFFF
        seed += x.to_bytes(4, "little")
    assert ChaCha20Rng.seed_from_u64(42).key == \
        ChaCha20Rng(seed).key


# ---------------------------------------------------------------------------
# layer 2: samplers — reference rejection rules + distribution sanity
# ---------------------------------------------------------------------------

def test_uniform_sampler_mask_and_range():
    rng = ChaCha20Rng.seed_from_u64(42)
    poly = parity.sample_uniform_poly(1024, 65537, rng)
    assert poly.shape == (1024,)
    assert (poly < 65537).all()
    # mask is 2^17 - 1 for q = 65537: acceptance ~ 1/2, so > 1024 draws used
    rng2 = ChaCha20Rng.seed_from_u64(42)
    draws = 0
    produced = 0
    while produced < 1024:
        v = rng2.random_u64() & ((1 << 17) - 1)
        draws += 1
        if v < 65537:
            produced += 1
    rng3 = ChaCha20Rng.seed_from_u64(42)
    again = parity.sample_uniform_poly(1024, 65537, rng3)
    assert (poly == again).all()
    assert draws > 1024


def test_ternary_sampler_frequencies():
    rng = ChaCha20Rng.seed_from_u64(42)
    q = 65537
    poly = parity.sample_ternary_poly(1024, q, rng)
    zeros = int((poly == 0).sum())
    ones = int((poly == 1).sum())
    negs = int((poly == q - 1).sum())
    assert zeros + ones + negs == 1024
    for c in (zeros, ones, negs):  # reference test bounds (uniform.rs:73-87)
        assert 200 < c < 500


def test_gaussian_sampler_moments():
    rng = ChaCha20Rng.seed_from_u64(42)
    sigma = 3.2
    samples = [parity.sample_discrete_gaussian(sigma, rng)
               for _ in range(10000)]
    mean = sum(samples) / len(samples)
    var = sum((s - mean) ** 2 for s in samples) / len(samples)
    assert abs(mean) < 0.5
    assert abs(var - sigma * sigma) < 2.0
    tail = 20
    assert all(abs(s) <= tail for s in samples)


# ---------------------------------------------------------------------------
# layer 3: pipeline parity vs a pure-Python big-int oracle
# ---------------------------------------------------------------------------

def _tiny_params():
    from exacto_tpu.params import BfvParamsBuilder

    return (BfvParamsBuilder().ring_degree(16).plain_modulus(257)
            .ct_moduli([1099509805057]).aux_moduli([562949953443841])
            .sigma(3.2).build())


def _negacyclic_mul_int(a, b, q, n):
    out = [0] * n
    for i in range(n):
        ai = int(a[i])
        if not ai:
            continue
        for j in range(n):
            k = i + j
            t = ai * int(b[j])
            if k < n:
                out[k] = (out[k] + t) % q
            else:
                out[k - n] = (out[k - n] - t) % q
    return out


def test_encrypt_sk_parity_vs_oracle():
    from exacto_tpu.bfv.encoding import Plaintext
    from exacto_tpu.bfv.encrypt import decrypt
    from exacto_tpu.ring.rns import to_u64_host

    params = _tiny_params()
    n = params.ring_degree
    q = params.ct_basis.moduli[0]

    # engine path
    rng = ChaCha20Rng.seed_from_u64(42)
    sk = parity.gen_secret_key_with_rng(rng, params)
    pt = Plaintext(coeffs=np.array([123] + [0] * (n - 1), dtype=np.uint64),
                   modulus=params.plain_modulus)
    ct = parity.encrypt_sk_with_rng(rng, pt, sk)

    # oracle path: same stream, big-int arithmetic
    orng = ChaCha20Rng.seed_from_u64(42)
    s = parity.sample_ternary_poly(n, q, orng)
    a = parity.sample_uniform_poly(n, q, orng)
    e = parity.sample_gaussian_poly(n, q, params.sigma, orng)
    delta = params.big_q // params.plain_modulus
    a_s = _negacyclic_mul_int(a, s, q, n)
    c0_oracle = [(-(a_s[i]) + int(e[i]) + (delta * 123 if i == 0 else 0)) % q
                 for i in range(n)]

    c0_engine = to_u64_host(params.ct_basis, ct.c[0])[0]
    c1_engine = to_u64_host(params.ct_basis, ct.c[1])[0]
    assert [int(v) for v in c1_engine] == [int(v) for v in a]
    assert [int(v) for v in c0_engine] == c0_oracle

    out = decrypt(ct, sk)
    assert int(out.coeffs[0]) == 123


def test_encrypt_pk_parity_vs_oracle():
    from exacto_tpu.bfv.encoding import Plaintext
    from exacto_tpu.bfv.encrypt import decrypt
    from exacto_tpu.ring.rns import to_u64_host

    params = _tiny_params()
    n = params.ring_degree
    q = params.ct_basis.moduli[0]

    rng = ChaCha20Rng.seed_from_u64(42)
    sk = parity.gen_secret_key_with_rng(rng, params)
    pk = parity.gen_public_key_with_rng(rng, sk)
    pt = Plaintext(coeffs=np.array([77] + [0] * (n - 1), dtype=np.uint64),
                   modulus=params.plain_modulus)
    ct = parity.encrypt_pk_with_rng(rng, pt, pk)

    orng = ChaCha20Rng.seed_from_u64(42)
    s = parity.sample_ternary_poly(n, q, orng)
    a = parity.sample_uniform_poly(n, q, orng)
    e = parity.sample_gaussian_poly(n, q, params.sigma, orng)
    a_s = _negacyclic_mul_int(a, s, q, n)
    pk0 = [(-(a_s[i] + int(e[i]))) % q for i in range(n)]
    u = parity.sample_binary_poly(n, q, orng)
    e1 = parity.sample_gaussian_poly(n, q, params.sigma, orng)
    e2 = parity.sample_gaussian_poly(n, q, params.sigma, orng)
    delta = params.big_q // params.plain_modulus
    pk0_u = _negacyclic_mul_int(pk0, u, q, n)
    a_u = _negacyclic_mul_int(a, u, q, n)
    c0_oracle = [(pk0_u[i] + int(e1[i]) + (delta * 77 if i == 0 else 0)) % q
                 for i in range(n)]
    c1_oracle = [(a_u[i] + int(e2[i])) % q for i in range(n)]

    assert [int(v) for v in to_u64_host(params.ct_basis, ct.c[0])[0]] \
        == c0_oracle
    assert [int(v) for v in to_u64_host(params.ct_basis, ct.c[1])[0]] \
        == c1_oracle
    assert int(decrypt(ct, sk).coeffs[0]) == 77


def test_relin_key_invariant():
    """rlk0[i] + rlk1[i]*s - base^i*s^2 must be the (small) gaussian noise."""
    from exacto_tpu.ring.rns import rp_add, rp_mul, rp_sub, to_u64_host

    params = _tiny_params()
    rng = ChaCha20Rng.seed_from_u64(7)
    sk = parity.gen_secret_key_with_rng(rng, params)
    rlk = parity.gen_relin_key_with_rng(rng, sk)
    basis = params.ct_basis
    q = basis.moduli[0]
    s_sq = rp_mul(basis, sk.poly, sk.poly)
    lhs = rp_add(basis, rlk.rlk0, rp_mul(basis, rlk.rlk1, sk.poly))
    for i in range(params.gadget_digits):
        gi = pow(params.gadget_base, i, q)
        pick = lambda p, idx: type(p)(lo=p.lo[idx], hi=p.hi[idx])
        from exacto_tpu.ring.rns import rp_scalar_mul

        g_ssq = rp_scalar_mul(basis, s_sq, basis.mont_scalar_pair([gi]))
        diff = rp_sub(basis, pick(lhs, i), g_ssq)
        vals = to_u64_host(basis, diff)[0]
        centered = [int(v) if int(v) <= q // 2 else int(v) - q for v in vals]
        assert max(abs(c) for c in centered) <= 20  # 6 sigma


@pytest.mark.slow
def test_dbfv_roundtrip_chacha():
    """Mirrors reference dbfv/encrypt.rs:243-267 seeded roundtrips."""
    from exacto_tpu.dbfv import dbfv_decrypt
    from exacto_tpu.params import DbfvParams
    from exacto_tpu.params.presets import compact_dbfv

    params = compact_dbfv()
    rng = ChaCha20Rng.seed_from_u64(42)
    sk = parity.gen_secret_key_with_rng(rng, params.bfv_params)
    pk = parity.gen_public_key_with_rng(rng, sk)
    ct = parity.dbfv_encrypt_with_rng(rng, 173, pk, params)
    assert int(dbfv_decrypt(ct, sk)) == 173
