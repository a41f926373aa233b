"""Sweep the fused-kernel batch-tile size (EXACTO_TPU_BT) on the live
backend and print per-kernel times — finds the pipelining sweet spot the
static VMEM-budget heuristics in ops/ntt_pallas32 may miss.

Usage: python tools/sweep_bt.py [--batch 256] [--bts 4,8,16,32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--bts", default="4,8,16,32,64")
    args = ap.parse_args()

    import jax
    import numpy as np

    from exacto_tpu import narrow as nr

    B = args.batch
    n = 4096
    params = nr.u64_dbfv_fast(n)
    bp = params.bfv
    sk = jax.jit(lambda k: nr.gen_secret_key(k, bp))(jax.random.PRNGKey(1))
    rlk = jax.jit(lambda k: nr.gen_relin_key(k, sk))(jax.random.PRNGKey(2))
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 63, size=B, dtype=np.uint64) * 2 + 1
    b = rng.integers(0, 1 << 63, size=B, dtype=np.uint64) * 2 + 1
    ct1 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(3), a, sk, params)
    ct2 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(4), b, sk, params)

    def bench(fn, *xs, iters=10):
        out = fn(*xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(*xs) for _ in range(iters)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / iters

    from exacto_tpu.ops import ntt_pallas32 as k32

    ref = None
    for bt in [int(x) for x in args.bts.split(",")]:
        os.environ["EXACTO_TPU_BT"] = str(bt)
        k32._build.cache_clear()
        k32._build_extend3.cache_clear()
        k32._build_hps.cache_clear()
        k32._build_relin.cache_clear()
        try:
            ext = jax.jit(lambda c: nr._extend_to_aux(
                bp, c.limbs.c0, res=c.limbs.c0c))
            t_ext = bench(ext, ct1)
            mul = jax.jit(lambda x, y, r: nr.dbfv_mul(x, y, r))
            t_full = bench(mul, ct1, ct2, rlk)
            out = mul(ct1, ct2, rlk)
            dec = nr.dbfv_decrypt(out, sk)
            ok = bool(np.array_equal(np.asarray(dec),
                                     (a.astype(object) * b.astype(object)
                                      % (1 << 64)).astype(np.uint64)))
            if ref is None:
                ref = t_full
            print(f"bt={bt:3d}  extend3 {t_ext*1e3:7.2f} ms  "
                  f"full {t_full*1e3:7.2f} ms  ({B/t_full:6.0f} ops/s, "
                  f"{t_full/ref:5.2f}x vs first)  parity={ok}")
        except Exception as exc:  # noqa: BLE001
            print(f"bt={bt:3d}  FAILED: {str(exc)[:100]}")
    os.environ.pop("EXACTO_TPU_BT", None)


if __name__ == "__main__":
    main()
