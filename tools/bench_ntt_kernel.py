"""Micro-throughput of the fused NTT kernels at multiply-shaped operands.

Times ntt_fwd32_fused / ntt_inv32_fused on [B, L, n] (the narrow dBFV
multiply's dominant transform shape) and prints ns per element per stage —
directly comparable to utils/roofline.stage_cost_ns() (the measured
VPU stage-price floor).

Run on the chip: python tools/bench_ntt_kernel.py [--n 4096 --B 256 --L 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--L", type=int, default=5)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from exacto_tpu import narrow as nr
    from exacto_tpu.ops import ntt_pallas32 as npal
    from exacto_tpu.utils.roofline import stage_cost_ns

    n, B, L = args.n, args.B, args.L
    qs = nr.find_narrow_primes(n, L, 30)
    basis = nr.NarrowBasis.create(qs, n)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, min(qs), size=(B, L, n),
                                 dtype=np.uint32))
    interp = jax.default_backend() != "tpu"

    fwd = jax.jit(lambda b, v: npal.ntt_fwd32_fused(
        v, b.moduli, interpret=interp, tables=(b.stw_fwd, b.stw_fwd_sh)))
    inv = jax.jit(lambda b, v: npal.ntt_inv32_fused(
        v, b.moduli, interpret=interp, tables=(b.stw_inv, b.stw_inv_sh)))

    logn = n.bit_length() - 1
    elems = B * L * n * logn  # element-stages per transform
    for name, f in (("fwd", fwd), ("inv", inv)):
        y = jax.block_until_ready(f(basis, x))
        t0 = time.time()
        for _ in range(args.iters):
            y = f(basis, y)
        jax.block_until_ready(y)
        dt = (time.time() - t0) / args.iters
        print(json.dumps({
            "kernel": name, "n": n, "B": B, "L": L,
            "ms": round(dt * 1e3, 3),
            "ns_per_elem_stage": round(dt / elems * 1e9, 4),
            "floor_ns_per_elem_stage": round(stage_cost_ns(), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
