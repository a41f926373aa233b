"""Pallas NTT kernel vs the jnp reference path (interpret mode on CPU)."""

import numpy as np
import jax
import pytest

from exacto_tpu.params import BfvParamsBuilder
from exacto_tpu.ring import ntt as nttmod
from exacto_tpu.ring import wordops as w
from exacto_tpu.ops import ntt_pallas


@pytest.mark.parametrize("n,L,batch", [(128, 1, 4), (256, 2, 2), (128, 2, 6)])
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
    got_f = ntt_pallas.ntt_fwd_pallas(x, basis, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_f[0]), np.asarray(ref_f[0]))
    np.testing.assert_array_equal(np.asarray(got_f[1]), np.asarray(ref_f[1]))

    ref_i = nttmod.ntt_inv(ref_f, basis.ipsi_rev, basis.ninv, basis.q, basis.qinv)
    got_i = ntt_pallas.ntt_inv_pallas(got_f, basis, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_i[0]), np.asarray(ref_i[0]))
    np.testing.assert_array_equal(np.asarray(got_i[1]), np.asarray(ref_i[1]))
