"""Tests for auxiliary subsystems: noise API, serialization, security estimator."""

import os

import numpy as np
import jax
import pytest

from exacto_tpu.params import BfvParamsBuilder
from exacto_tpu.params.security import check_security, estimate_security_bits, min_ring_degree
from exacto_tpu.bfv import encode_scalar, encrypt_sk, decrypt, decode_scalar, gen_secret_key
from exacto_tpu.utils.noise import bfv_noise_inf, noise_budget_bits
from exacto_tpu.utils import serialization as ser


def tiny_params():
    return (BfvParamsBuilder().ring_degree(16).plain_modulus(257)
            .ct_moduli([1099509805057]).aux_moduli([562949953443841])
            .sigma(3.2).build())


def test_noise_meter_fresh_ciphertext():
    params = tiny_params()
    sk = gen_secret_key(jax.random.PRNGKey(0), params)
    ct = encrypt_sk(jax.random.PRNGKey(1), encode_scalar(42, params), sk)
    noise = bfv_noise_inf(ct, sk)
    # fresh sk-encryption noise is the Gaussian e: |e| <= ~6*sigma
    assert 0 < noise < 100
    assert noise_budget_bits(ct, sk) > 20


def test_security_estimator_monotonic():
    # larger n -> more security; larger q -> less
    s1 = estimate_security_bits(1024, 27)
    s2 = estimate_security_bits(2048, 27)
    s3 = estimate_security_bits(2048, 54)
    assert s2 > s1
    assert s2 > s3
    assert check_security(4096, 60, 3.2, 80)
    assert min_ring_degree(60, 3.2, 100) <= 8192


def test_builder_enforces_security():
    from exacto_tpu.errors import InvalidParam

    with pytest.raises(InvalidParam):
        (BfvParamsBuilder().ring_degree(16).plain_modulus(257)
         .ct_moduli([1099509805057]).min_security_bits(128).build())


def test_serialization_roundtrip(tmp_path):
    params = tiny_params()
    sk = gen_secret_key(jax.random.PRNGKey(5), params)
    path = os.path.join(tmp_path, "sk.npz")
    ser.save_pytree(path, sk, meta={"params": ser.params_to_dict(params)})

    # reload: rebuild params from metadata, use a fresh key as the structure example
    meta = ser.load_meta(path)
    params2 = ser.params_from_dict(meta["params"])
    example = gen_secret_key(jax.random.PRNGKey(0), params2)
    sk2 = ser.load_pytree_like(path, example)

    # the restored key decrypts ciphertexts made with the original
    ct = encrypt_sk(jax.random.PRNGKey(6), encode_scalar(99, params), sk)
    assert decode_scalar(decrypt(ct, sk2)) == 99


def test_fast_base_extend_value_mod_dst():
    import jax.numpy as jnp
    from exacto_tpu.ring.rns import (
        RnsBasis, fast_base_extend, from_host_residues, to_u64_host,
        crt_to_ints_host,
    )

    n = 16
    src = RnsBasis.create([65537, 1099509805057], n)
    dst = RnsBasis.create([562949953443841], n)
    rng = np.random.default_rng(3)
    res = np.zeros((2, n), dtype=np.uint64)
    res[0] = rng.integers(0, 65537, n, dtype=np.uint64)
    res[1] = rng.integers(0, 1099509805057, n, dtype=np.uint64)
    poly = from_host_residues(src, res)
    ext = fast_base_extend(src, dst, poly)
    got = to_u64_host(dst, ext)[0]
    big_a = src.modulus_product
    xs = crt_to_ints_host(src, res)
    for j in range(n):
        x = int(xs[j])
        # approximate extension: x + u*A for u in [0, k)
        candidates = {(x + u * big_a) % 562949953443841 for u in range(2)}
        assert int(got[j]) in candidates, j


def test_security_calibration_hits_standard_anchors():
    """The calibrated estimator reproduces the HomomorphicEncryption.org
    table values at every anchor (ternary secret, classical)."""
    from exacto_tpu.params.security import HE_STANDARD_LOGQ

    for n, (q128, q192, q256) in HE_STANDARD_LOGQ.items():
        for logq, want in ((q128, 128), (q192, 192), (q256, 256)):
            got = estimate_security_bits(n, logq)
            assert abs(got - want) < 6, (n, logq, got)


def test_production_presets_enforce_security():
    from exacto_tpu.params.presets import small_bfv, u64_dbfv

    small_bfv()
    u64_dbfv()
    from exacto_tpu import narrow as nr

    nr.u64_dbfv_fast(4096)


def test_secret_key_destroy():
    """Key-hygiene API (reference zeroizes SecretKey on Drop,
    keygen.rs:13-26): destroy() frees the buffers; any later use fails."""
    import jax
    import pytest

    from exacto_tpu import narrow as nr
    from exacto_tpu.bfv import gen_secret_key as wide_gen
    from exacto_tpu.params.presets import compact_bfv

    qs = nr.find_narrow_primes(64, 2, 30)
    ps = nr.find_narrow_primes(64, 3, 30, skip=qs)
    params = nr.NarrowParams.create(64, 257, qs, ps)
    sk = nr.gen_secret_key(jax.random.PRNGKey(0), params)
    sk.destroy()
    with pytest.raises(Exception):
        _ = np.asarray(sk.poly) + 0

    wparams = compact_bfv()
    wsk = wide_gen(jax.random.PRNGKey(1), wparams)
    wsk.destroy()
    with pytest.raises(Exception):
        jax.block_until_ready(
            [leaf + 0 for leaf in jax.tree_util.tree_leaves(wsk.poly)
             if hasattr(leaf, "ndim")])
