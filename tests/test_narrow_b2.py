"""Bootstrappable binary-digit profiles (u64_dbfv_b2 and CPU-scale analogs).

The u64-capable bootstrap route: p = 2^k as k binary digits with t = 2^8,
so every post-multiply limb value is <= d and t | 2^e_lo makes the
narrow_boot rounding pipeline apply unchanged (see narrow.u64_dbfv_b2).
Tier 1 here: the d=64 binary-digit multiply itself decrypts u64 products
exactly (CPU, small n).  Tier 2 (slow): the full chain contract at a
CPU-scale analog — dbfv_mul_chain_then_bootstrap of three values over a
p = 2^16 / d = 16 / b = 2 scheme, exercising the chunked
Paterson-Stockmeyer and the security-gated boot params.
Reference contract: dbfv_mul_then_bootstrap / dbfv_mul_chain_then_bootstrap,
/root/reference/src/bootstrap/bfv_host.rs:242-288.
"""

import numpy as np
import jax
import pytest

from exacto_tpu import narrow as nr
from exacto_tpu import narrow_boot as nb
from exacto_tpu.errors import InvalidParam


def _b2_params(n, width, t=256):
    """p = 2^width as binary digits (same shape as u64_dbfv_b2/_chain)."""
    qs = nr.find_narrow_primes(n, 2, 30)
    ps = nr.find_narrow_primes(n, 3, 30, skip=qs)
    bfv = nr.NarrowParams.create(n, t, qs, ps, gadget_base=1 << 21)
    p = 0 if width == 64 else (1 << width)
    return nr.NarrowDbfvParams(base=2, num_digits=width, plain_modulus=p,
                               bfv=bfv)


@pytest.mark.slow
def test_u64_b2_mul_decrypts_exactly():
    """d=64 binary-digit multiply: u64 products mod 2^64, incl. u64::MAX
    (the reference's edge case, dbfv/eval.rs:316-327)."""
    params = _b2_params(128, 64)
    sk = nr.gen_secret_key(jax.random.PRNGKey(0), params.bfv)
    rlk = nr.gen_relin_key(jax.random.PRNGKey(1), sk)
    a = np.array([0xFFFFFFFFFFFFFFFF, 0x0123456789ABCDEF, 3],
                 dtype=np.uint64)
    b = np.array([0xFFFFFFFFFFFFFFFF, 0x00000000DEADBEEF, 5],
                 dtype=np.uint64)
    ct_a = nr.dbfv_encrypt_sk(jax.random.PRNGKey(2), a, sk, params)
    ct_b = nr.dbfv_encrypt_sk(jax.random.PRNGKey(3), b, sk, params)
    prod = nr.dbfv_mul(ct_a, ct_b, rlk)
    got = np.asarray(nr.dbfv_decrypt(prod, sk), dtype=np.uint64)
    want = a * b  # numpy u64 wraps mod 2^64
    assert np.array_equal(got, want), (got, want)


def test_u64_dbfv_b2_preset_shape():
    p = nr.u64_dbfv_b2(4096)
    assert (p.base, p.num_digits, p.plain_modulus) == (2, 64, 0)
    assert p.bfv.plain_modulus == 256
    assert len(p.bfv.moduli) == 2 and len(p.bfv.aux_moduli) == 3
    # t | 2^e: the narrow_boot modswitch constraint the flagship t=1040407
    # can never meet
    assert (1 << 13) % p.bfv.plain_modulus == 0


def test_boot_params_security_gate():
    """make_boot_params refuses sub-128-bit boot schemes unless overridden,
    and records the estimate either way."""
    orig = _b2_params(256, 16)
    with pytest.raises(InvalidParam, match="secure"):
        nb.make_boot_params(orig, e_lo=13, hamming=4, l_extra=10, a_boot=13)
    bp = nb.make_boot_params(orig, e_lo=13, hamming=4, l_extra=10,
                             a_boot=13, allow_insecure=True)
    assert 0 < bp.security_bits < 128


def test_boot_params_modswitch_margin_gate():
    orig = _b2_params(256, 16)
    with pytest.raises(InvalidParam, match="margin"):
        # Delta' = 2^11/2^8 = 8 < 2(h+2) = 20
        nb.make_boot_params(orig, e_lo=11, hamming=8, l_extra=10,
                            a_boot=13, allow_insecure=True)


def test_digit_split_rounding_tables():
    """in_u digit tables: P_i(u) == scaled digit_i(m(z)) for u = z - zmin
    (host evaluation, all digits)."""
    from exacto_tpu.ring import hostmath as hm

    t_orig, qp, n, h = 256, 1 << 11, 64, 2
    zmin = -(h * qp) // 2
    zmax = qp - 1 + (h * qp) // 2
    span = zmax - zmin + 3
    t_boot = span * 8 + 1
    while not hm.is_prime(t_boot):
        t_boot += 1
    delta_p = qp // t_orig
    rng = np.random.default_rng(0)
    zs = [zmin, zmax, 0] + [int(v) for v in rng.integers(zmin, zmax, 40)]
    for digit in range(4):
        coeffs = nb.rounding_poly_coeffs(t_boot, t_orig, qp, n, zmin, zmax,
                                         split_base=4, digit=digit,
                                         in_u=True)
        p = t_boot
        for z in zs:
            u = z - zmin
            acc, up = 0, 1
            for a in coeffs:
                acc = (acc + a * up) % p
                up = up * u % p
            m = ((z % qp) + delta_p // 2) // delta_p % t_orig
            dig = (m >> (2 * digit)) & 3
            want = (dig * t_boot + t_orig // 2) // t_orig % p
            assert acc == want, (digit, z)


@pytest.fixture(scope="module")
def b2_chain_setup():
    """Digit-split chain analog: p = 2^8, d = 8, t = 2^8, split_base 4
    (fixpoint: V = 4 digits x 3 = 12, acc x fresh mul <= 8*12 = 96 <
    t/2 = 128)."""
    n, width = 64, 8
    params = _b2_params(n, width, t=256)
    bparams = nb.auto_boot_params(params, e_lo=11, hamming=2,
                                  allow_insecure=True, split_base=4)
    sk = nr.gen_secret_key(jax.random.PRNGKey(1), params.bfv,
                           hamming_weight=2)
    rlk = nr.gen_relin_key(jax.random.PRNGKey(2), sk)
    bk, _ = nb.gen_boot_key(jax.random.PRNGKey(3), sk, bparams)
    return params, sk, rlk, bk


@pytest.mark.slow
def test_b2_mul_chain_then_bootstrap(b2_chain_setup):
    """Depth-3 chain a*b*c*e mod 2^8 via dbfv_mul_chain_then_bootstrap
    with the VALUE-REDUCING bootstrap: every intermediate is refreshed
    and digit-split, the result is depth 0 with limb values <= 12, and
    still multipliable."""
    params, sk, rlk, bk = b2_chain_setup
    assert bk.params.n_split_digits == 4
    vals = np.array([[0xBE, 7, 3, 251], [0xFF, 0xFF, 2, 9]],
                    dtype=np.uint64).T  # [4 operands, batch 2]
    cts = [nr.dbfv_encrypt_sk(jax.random.PRNGKey(10 + i), vals[i], sk,
                              params) for i in range(4)]
    out = nb.dbfv_mul_chain_then_bootstrap(cts, rlk, bk, chunk=8)
    assert out.mul_depth == 0
    got = np.asarray(nr.dbfv_decrypt(out, sk), dtype=np.uint64)
    want = (vals[0] * vals[1] * vals[2] * vals[3]) % (1 << 8)
    assert np.array_equal(got, want), (got, want)
    # still chainable: one more multiply decrypts
    ct5 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(99),
                             np.array([3, 5], dtype=np.uint64), sk, params)
    out2 = nr.dbfv_mul(out, ct5, rlk)
    got2 = np.asarray(nr.dbfv_decrypt(out2, sk), dtype=np.uint64)
    assert np.array_equal(got2, want * np.array([3, 5], dtype=np.uint64)
                          % (1 << 8))


def test_pick_t_boot_residue():
    """Digit-split t_boot is prime AND == 1 mod t_orig (round-5 fix for
    the reinterpret rounding residual — the eps(dig) error collapses to
    dig/t_orig); the non-split path just takes the next prime."""
    from exacto_tpu.ring import hostmath as hm

    t = nb._pick_t_boot(163842, 16, 2048)
    assert hm.is_prime(t) and t % 2048 == 1 and t >= 163842 * 16
    t2 = nb._pick_t_boot(73730, 1, 0)
    assert hm.is_prime(t2) and t2 >= 73730
    # auto path at the chain profile shape: same residue property
    orig = _b2_params(256, 16, t=2048)
    bp = nb.auto_boot_params(orig, e_lo=15, hamming=2,
                             allow_insecure=True, split_base=4)
    assert bp.boot.plain_modulus % 2048 == 1


def test_security_h_aware_bounds():
    """security_bits_h = min(uniform, sparse-MITM); the gate keys on it
    (VERDICT r4 weak #5)."""
    from exacto_tpu.params.security import (estimate_security_bits,
                                            estimate_security_bits_h,
                                            sparse_mitm_bits)

    # sparse secret caps security regardless of n/Q
    assert sparse_mitm_bits(32768, 8) < 80
    assert sparse_mitm_bits(32768, 21) > 128
    assert sparse_mitm_bits(4096, 4096) == float("inf") or \
        sparse_mitm_bits(4096, 2048) > 1000  # dense: bound vacuous
    u = estimate_security_bits(32768, 570)
    assert estimate_security_bits_h(32768, 570, 8) == \
        min(u, sparse_mitm_bits(32768, 8))
    assert estimate_security_bits_h(32768, 570, None) == u
    # the gate refuses an h=8 scheme whose uniform figure would pass
    orig = _b2_params(256, 16)
    with pytest.raises(InvalidParam, match="MITM|secure"):
        nb.make_boot_params(orig, e_lo=13, hamming=4, l_extra=10,
                            a_boot=13)
    bp = nb.make_boot_params(orig, e_lo=13, hamming=4, l_extra=10,
                             a_boot=13, allow_insecure=True)
    assert bp.security_bits_h <= bp.security_bits
