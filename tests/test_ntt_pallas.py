"""Pallas NTT kernel vs the jnp reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exacto_tpu.params import BfvParamsBuilder
from exacto_tpu.ring import ntt as nttmod
from exacto_tpu.ring import wordops as w
from exacto_tpu.ops import ntt_pallas


@pytest.mark.parametrize("n,L,batch", [(256, 1, 4), (256, 2, 2), (512, 2, 2)])
def test_pallas_ntt_matches_jnp(n, L, batch, rng):
    moduli = []
    # pick L NTT-friendly primes for this n from the known pool
    pool = [1099509805057, 562949953443841, 1152921504606830593,
            18014398509998081, 36028797018972161]
    for m in pool:
        if (m - 1) % (2 * n) == 0:
            moduli.append(m)
        if len(moduli) == L:
            break
    assert len(moduli) == L
    from exacto_tpu.ring.rns import RnsBasis

    basis = RnsBasis.create(moduli, n)

    arr = np.zeros((batch, L, n), dtype=np.uint64)
    for b in range(batch):
        for li in range(L):
            arr[b, li] = rng.integers(0, moduli[li], n, dtype=np.uint64)
    lo, hi = w.to_pair_np(arr)
    import jax.numpy as jnp

    x = (jnp.asarray(lo), jnp.asarray(hi))

    ref_f = nttmod.ntt_fwd(x, basis.psi_rev, basis.q, basis.qinv)
    got_f = ntt_pallas.ntt_fwd_fused(x, basis.moduli, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_f[0]), np.asarray(ref_f[0]))
    np.testing.assert_array_equal(np.asarray(got_f[1]), np.asarray(ref_f[1]))

    ref_i = nttmod.ntt_inv(ref_f, basis.ipsi_rev, basis.ninv, basis.q, basis.qinv)
    got_i = ntt_pallas.ntt_inv_fused(got_f, basis.moduli, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_i[0]), np.asarray(ref_i[0]))
    np.testing.assert_array_equal(np.asarray(got_i[1]), np.asarray(ref_i[1]))

    # full domain-conversion fusion: standard-form residues in -> NTT ->
    # standard-form residues out (the rns.py call-site contract)
    got_sf = ntt_pallas.ntt_fwd_fused(x, basis.moduli, to_mont=True,
                                      interpret=True)
    mont = w.to_mont(x, basis.bq(1), basis.bqinv(1), basis.br2(1))
    ref_sf = nttmod.ntt_fwd(mont, basis.psi_rev, basis.q, basis.qinv)
    np.testing.assert_array_equal(np.asarray(got_sf[0]), np.asarray(ref_sf[0]))
    back = ntt_pallas.ntt_inv_fused(got_sf, basis.moduli, from_mont=True,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(back[0]), lo)
    np.testing.assert_array_equal(np.asarray(back[1]), hi)


def test_pallas_extend_ntt_fused_matches_jnp(rng):
    """Fused base-extend + aux NTT kernel == the narrow engine's jnp path
    (compose -> centered reduce -> from_coeff_residues32), bit-exact."""
    from exacto_tpu import narrow as nr
    from exacto_tpu.ops import ntt_pallas32 as npal

    n = 256
    qs = nr.find_narrow_primes(n, 2, 31)
    ps = nr.find_narrow_primes(n, 3, 31, skip=qs)
    params = nr.NarrowParams.create(n, 1040407, qs, ps)
    res = np.stack([rng.integers(0, m, size=(3, n)).astype(np.uint32)
                    for m in params.moduli], axis=-2)  # [3, 2, n]
    import jax.numpy as jnp

    ref = nr._extend_to_aux(params, None, res=jnp.asarray(res))
    got = npal.extend_ntt_fused(jnp.asarray(res), params.moduli,
                                params.aux_moduli, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_relin_dot_fused_matches_jnp(rng):
    """Fused gadget-keyswitch kernel == digits -> per-digit NTT -> Montgomery
    dot -> digit sum on the jnp path, bit-exact."""
    from exacto_tpu import narrow as nr
    from exacto_tpu.ring import wordops32 as w32
    from exacto_tpu.ops import ntt_pallas32 as npal
    import jax.numpy as jnp

    n = 256
    qs = nr.find_narrow_primes(n, 2, 31)
    ps = nr.find_narrow_primes(n, 3, 31, skip=qs)
    params = nr.NarrowParams.create(n, 1040407, qs, ps, gadget_base=1 << 21)
    res = np.stack([rng.integers(0, m, size=(3, n)).astype(np.uint32)
                    for m in params.moduli], axis=-2)
    D = params.gadget_digits
    rlk0 = np.stack([rng.integers(0, m, size=(D, n)).astype(np.uint32)
                     for m in params.moduli], axis=-2)
    rlk1 = np.stack([rng.integers(0, m, size=(D, n)).astype(np.uint32)
                     for m in params.moduli], axis=-2)

    digits = nr._gadget_digits32(params, None, res=jnp.asarray(res))
    q, qi = params.ct_basis.b1()
    p0 = w32.mont_mul32(digits, jnp.asarray(rlk0), q, qi)
    p1 = w32.mont_mul32(digits, jnp.asarray(rlk1), q, qi)
    ref0, ref1 = p0[..., 0, :, :], p1[..., 0, :, :]
    for i in range(1, D):
        ref0 = w32.mod_add32(ref0, p0[..., i, :, :], q)
        ref1 = w32.mod_add32(ref1, p1[..., i, :, :], q)

    a0, a1 = npal.relin_dot_fused(jnp.asarray(res), jnp.asarray(rlk0),
                                  jnp.asarray(rlk1), params.moduli,
                                  params.gadget_base, D, interpret=True)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(ref0))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(ref1))


@pytest.mark.parametrize("eval_out", [True, False])
def test_pallas_hps_ntt_fused_matches_jnp(rng, eval_out):
    """Fused HPS mega-kernel (INTT both bases + CRT/Garner glue + output
    NTT) == `narrow._narrow_hps_scale` on the jnp path, bit-exact."""
    from exacto_tpu import narrow as nr
    from exacto_tpu.ops import ntt_pallas32 as npal
    import jax.numpy as jnp

    n = 256
    qs = nr.find_narrow_primes(n, 2, 31)
    ps = nr.find_narrow_primes(n, 3, 31, skip=qs)
    params = nr.NarrowParams.create(n, 1040407, qs, ps)
    tq_res = np.stack([rng.integers(0, m, size=(4, n)).astype(np.uint32)
                       for m in params.moduli], axis=-2)
    tp_res = np.stack([rng.integers(0, m, size=(4, n)).astype(np.uint32)
                       for m in params.aux_moduli], axis=-2)
    t_q = nr.from_coeff_residues32(params.ct_basis, jnp.asarray(tq_res))
    t_p = nr.from_coeff_residues32(params.aux_basis, jnp.asarray(tp_res))

    ref = nr._narrow_hps_scale(params, t_q, t_p, eval_out=eval_out)
    got = npal.hps_ntt_fused(t_q, t_p, params.moduli, params.aux_moduli,
                             params.plain_modulus, eval_out=eval_out,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_extend3_ntt_fused_matches_jnp(rng):
    """Batch-gridded fused extend (one compose -> all aux limbs + NTTs) ==
    the narrow engine's jnp path, bit-exact."""
    from exacto_tpu import narrow as nr
    from exacto_tpu.ops import ntt_pallas32 as npal
    import jax.numpy as jnp

    n = 256
    qs = nr.find_narrow_primes(n, 2, 31)
    ps = nr.find_narrow_primes(n, 3, 31, skip=qs)
    params = nr.NarrowParams.create(n, 1040407, qs, ps)
    res = np.stack([rng.integers(0, m, size=(3, n)).astype(np.uint32)
                    for m in params.moduli], axis=-2)
    ref = nr._extend_to_aux(params, None, res=jnp.asarray(res))
    got = npal.extend3_ntt_fused(jnp.asarray(res), params.moduli,
                                 params.aux_moduli, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled-kernel regression check needs a TPU")
def test_wide_kernel_multi_modulus_compiled():
    """Regression: the tw BlockSpec selects the l-th limb block, so the
    in-kernel index must be 0.  Interpret mode CLAMPS an out-of-range
    l to 0 (accidentally correct), so only the compiled kernel catches a
    wrong index — at L >= 2 every limb > 0 got limb 0's twiddles."""
    from exacto_tpu.ring import rns as R
    from exacto_tpu.ring import ntt as nttmod
    from exacto_tpu.ring import wordops as w
    from exacto_tpu.ops import ntt_pallas as wpal

    n = 512
    mods = (18014398509998081, 36028797018972161)
    basis = R.RnsBasis.create(mods, n)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, q, size=(4, n), dtype=np.uint64)
                  for q in mods], axis=1)
    res = (jnp.asarray((x & 0xFFFFFFFF).astype(np.uint32)),
           jnp.asarray((x >> 32).astype(np.uint32)))
    mont = w.to_mont(res, basis.bq(1), basis.bqinv(1), basis.br2(1))
    ref = nttmod.ntt_fwd(mont, basis.psi_rev, basis.q, basis.qinv)
    got = wpal.ntt_fwd_fused(res, mods, to_mont=True, interpret=False)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
