"""On-device compiled-kernel selftest (VERDICT round-2 weak #3).

Interpret-mode Pallas on CPU CLAMPS out-of-range indices, so a kernel can
pass every CPU parity test and still be wrong on hardware (the round-2
wide-NTT twiddle-index bug, commit 704bff2, was exactly this class).  This
module re-checks every fused kernel COMPILED on the live backend against
the jnp reference path, bit-exact, at the production ring degree:

  * each narrow Pallas gate (ntt / extend / hps / relin / limbconv) is
    toggled ON alone and the full `dbfv_mul` output compared to the
    all-jnp baseline — the comparison runs the real call sites, so wiring
    bugs are caught along with kernel bugs;
  * the wide pair kernel (ops/ntt_pallas) fwd+inv roundtrip vs the jnp
    wide NTT.

Used by `bench.py` (reported as "kernel_selftest" in the BENCH JSON;
BENCH_SELFTEST=0 skips) and callable standalone:
    python -m exacto_tpu.utils.selftest
"""

from __future__ import annotations

import os

import numpy as np

_GATES = {
    "ntt": "EXACTO_TPU_PALLAS_NTT",
    "extend": "EXACTO_TPU_PALLAS_EXTEND",
    "hps": "EXACTO_TPU_PALLAS_HPS",
    "relin": "EXACTO_TPU_PALLAS_RELIN",
    "limbconv": "EXACTO_TPU_PALLAS_LIMBCONV",
}


def _with_gates(on: set, fn):
    """Run fn with exactly `on` Pallas gates enabled (rest forced off)."""
    old = {v: os.environ.get(v) for v in _GATES.values()}
    try:
        for name, var in _GATES.items():
            os.environ[var] = "1" if name in on else "0"
        return fn()
    finally:
        for var, val in old.items():
            if val is None:
                os.environ.pop(var, None)
            else:
                os.environ[var] = val


def kernel_selftest(n: int = 4096, batch: int = 4) -> dict:
    """Returns {"ok": bool, "<kernel>": bool, ...}; each entry is a
    compiled-vs-jnp bit-exact comparison on the current default backend."""
    import jax

    from .. import narrow as nr

    results = {}

    params = nr.u64_dbfv_fast(n) if n >= 4096 else None
    if params is None:
        qs = nr.find_narrow_primes(n, 2, 30)
        ps = nr.find_narrow_primes(n, 3, 30, skip=qs)
        bfv = nr.NarrowParams.create(n, 1040407, qs, ps,
                                     gadget_base=1 << 21)
        params = nr.NarrowDbfvParams(base=256, num_digits=8,
                                     plain_modulus=0, bfv=bfv)
    sk = nr.gen_secret_key(jax.random.PRNGKey(11), params.bfv)
    rlk = nr.gen_relin_key(jax.random.PRNGKey(12), sk)
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 64, size=batch, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, size=batch, dtype=np.uint64)
    ct1 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(13), a, sk, params)
    ct2 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(14), b, sk, params)

    def run_mul():
        # fresh jit per gate config: reusing the module-level jit cache
        # would serve the previous config's executable for equal shapes
        out = jax.jit(nr._dbfv_mul_impl)(ct1, ct2, rlk)
        return (np.asarray(out.limbs.c0), np.asarray(out.limbs.c1))

    base0, base1 = _with_gates(set(), run_mul)
    for gate in _GATES:
        try:
            g0, g1 = _with_gates({gate}, run_mul)
            results[gate] = bool(np.array_equal(g0, base0)
                                 and np.array_equal(g1, base1))
        except Exception:  # noqa: BLE001 - a crash is a failure, not an abort
            results[gate] = False

    # wide pair kernel: fwd(to_mont) + inv(from_mont) roundtrip vs jnp
    try:
        import jax.numpy as jnp

        from ..ops import ntt_pallas as wpal
        from ..ring import ntt as nttmod
        from ..ring import rns as R
        from ..ring import wordops as w

        mods = (18014398509998081, 36028797018972161)
        wbasis = R.RnsBasis.create(mods, n)
        x = np.stack([rng.integers(0, q, size=(2, n), dtype=np.uint64)
                      for q in mods], axis=1)
        res = (jnp.asarray((x & 0xFFFFFFFF).astype(np.uint32)),
               jnp.asarray((x >> 32).astype(np.uint32)))
        mont = w.to_mont(res, wbasis.bq(1), wbasis.bqinv(1), wbasis.br2(1))
        ref = nttmod.ntt_fwd(mont, wbasis.psi_rev, wbasis.q, wbasis.qinv)
        got = wpal.ntt_fwd_fused(res, mods, to_mont=True, interpret=False)
        ok_f = (np.array_equal(np.asarray(ref[0]), np.asarray(got[0]))
                and np.array_equal(np.asarray(ref[1]), np.asarray(got[1])))
        back = wpal.ntt_inv_fused(got, mods, from_mont=True,
                                  interpret=False)
        ok_i = (np.array_equal(np.asarray(back[0]), (x & 0xFFFFFFFF)
                               .astype(np.uint32))
                and np.array_equal(np.asarray(back[1]),
                                   (x >> 32).astype(np.uint32)))
        results["wide_ntt"] = bool(ok_f and ok_i)
    except Exception:  # noqa: BLE001
        results["wide_ntt"] = False

    results["ok"] = all(results.values())
    return results


if __name__ == "__main__":
    import json

    print(json.dumps(kernel_selftest()))
