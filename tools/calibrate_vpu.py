"""Measure the practical VPU u32-multiply ceiling on this chip.

The roofline model needs a MEASURED compute ceiling, not a spec-sheet
number: 32-bit integer multiplies lower to 16-bit partial-product
sequences on the TPU VPU, so the practical u32 rate is far below the
nominal vector-op rate.  This kernel keeps a tile in VMEM/registers and
runs a K-deep SERIAL Shoup-multiply chain (data dependence defeats dead
-code elimination and ILP overcounting), so wall time / native-op count
is the achievable ceiling for exactly the op mix the NTT butterflies use.

Usage: python tools/calibrate_vpu.py   (prints Gop/s; paste into
exacto_tpu/utils/roofline.py VPU_NATIVE_GOPS if the chip generation
changes)
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from exacto_tpu.ring import wordops32 as w32

K = 64           # serial chain depth per element
MONT_NATIVE = 18  # native ops per mont_mul32 (roofline.MONT_MUL)


def _kernel(x_ref, o_ref, *, q, w, wsh):
    # Montgomery SQUARING chain: both operands data-dependent, so neither
    # XLA nor Mosaic can strength-reduce or elide any step (a
    # constant-multiplier Shoup chain measured 24 T mul/s — clearly
    # collapsed).  mont_mul32 = 2 mullo + 2 mulhi + carries ~ 18 native.
    cc = w32.mont_consts32(q)
    v = x_ref[...]
    qv = jnp.uint32(q)
    qi = jnp.uint32(cc["qinv_neg"])
    for _ in range(K):
        v = w32.mont_mul32(v, v, qv, qi)
    o_ref[...] = v


def _roll_kernel(x_ref, o_ref, *, q):
    # serial roll+add chain: measures the cross-lane permute cost that the
    # XOR-partner butterflies pay twice per stage
    from jax.experimental.pallas import tpu as pltpu

    v = x_ref[...]
    qv = jnp.uint32(q)
    for i in range(K):
        r = pltpu.roll(v, 1 + (i & 7), 1)
        v = w32.mod_add32(v, r, qv)
    o_ref[...] = v


def _addsel_kernel(x_ref, o_ref, *, q):
    # serial add + compare-select chain (the non-mul, non-roll butterfly ops)
    v = x_ref[...]
    qv = jnp.uint32(q)
    for _ in range(K):
        s = v + v
        v = jnp.where(s >= qv, s - qv, s)
    o_ref[...] = v


def _condsub_kernel(x_ref, o_ref, *, q):
    # serial add + SIGN-MASK conditional subtract (wordops32.cond_sub32) —
    # the select-free pattern that replaced compare-select in round 4
    v = x_ref[...]
    qv = jnp.uint32(q)
    for _ in range(K):
        v = w32.cond_sub32(v + v, qv)
    o_ref[...] = v


def _rowroll_kernel(x_ref, o_ref, *, q):
    # serial SUBLANE-axis roll+add chain: the cost the large-stride NTT
    # butterfly stages pay (vs the lane-axis rolls of _roll_kernel)
    from jax.experimental.pallas import tpu as pltpu

    v = x_ref[...]
    qv = jnp.uint32(q)
    for i in range(K):
        r = pltpu.roll(v, 1 + (i & 7), 0)
        v = w32.mod_add32(v, r, qv)
    o_ref[...] = v


def main():
    q = 1073479681  # 30-bit NTT prime
    w = 123456789 % q
    wsh = (w << 32) // q
    shape = (2048, 4096)  # 8M u32 lanes, 32 MB for in+out
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, q, size=shape, dtype=np.uint32))
    call = pl.pallas_call(
        partial(_kernel, q=q, w=w, wsh=wsh),
        grid=(64,),
        in_specs=[pl.BlockSpec((shape[0] // 64, shape[1]),
                               lambda i: (i, 0))],
        out_specs=pl.BlockSpec((shape[0] // 64, shape[1]), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.uint32),
    )
    out = call(x)
    jax.block_until_ready(out)
    iters = 20
    t0 = time.perf_counter()
    outs = [call(x) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    elems = shape[0] * shape[1]
    native = elems * K * MONT_NATIVE
    print("backend:", jax.default_backend())
    print("chain of %d mont_mul32 squarings over %.1fM lanes: %.3f ms" %
          (K, elems / 1e6, dt * 1e3))
    print("mont_mul32 rate  : %.1f Gmul/s" % (elems * K / dt / 1e9))
    print("native-op ceiling: %.0f Gop/s  (MONT_NATIVE=%d model)" %
          (native / dt / 1e9, MONT_NATIVE))

    def run(kfn, label):
        c = pl.pallas_call(
            partial(kfn, q=q),
            grid=(64,),
            in_specs=[pl.BlockSpec((shape[0] // 64, shape[1]),
                                   lambda i: (i, 0))],
            out_specs=pl.BlockSpec((shape[0] // 64, shape[1]),
                                   lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.uint32),
        )
        o = c(x)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        os_ = [c(x) for _ in range(iters)]
        jax.block_until_ready(os_)
        d = (time.perf_counter() - t0) / iters
        print("%s: %.3f ms  (%.1f G/s per step)" %
              (label, d * 1e3, elems * K / d / 1e9))
        return d

    d_roll = run(_roll_kernel, "chain of %d lane-roll+add   " % K)
    d_rroll = run(_rowroll_kernel, "chain of %d ROW-roll+add    " % K)
    d_sel = run(_addsel_kernel, "chain of %d add+cmp-select " % K)
    d_csub = run(_condsub_kernel, "chain of %d add+cond_sub32 " % K)
    print("cost ratio lane-roll/mont_mul: %.2f" % (d_roll / dt))
    print("cost ratio row-roll/mont_mul : %.2f" % (d_rroll / dt))
    print("cost ratio cmp-sel/mont_mul  : %.2f" % (d_sel / dt))
    print("cost ratio cond_sub/mont_mul : %.2f" % (d_csub / dt))
    print("cond_sub32 speedup vs cmp-select: %.2fx" % (d_sel / d_csub))


if __name__ == "__main__":
    main()
