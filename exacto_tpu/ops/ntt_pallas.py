"""Fused negacyclic NTT as a Pallas TPU kernel.

The jnp NTT in :mod:`exacto_tpu.ring.ntt` materializes the full tensor in
HBM between butterfly stages; this kernel keeps a [Bt, n] tile of the
polynomial batch resident in VMEM across ALL log2(n) stages, with the
twiddle table also VMEM-resident — one HBM read and one write per transform
instead of one per stage.

Grid: (L, batch_blocks).  Per-prime Montgomery constants ride a scalar table
in SMEM; the butterfly arithmetic is the same 32-bit-lane Montgomery code as
the jnp path (exacto_tpu.ring.wordops), so results are bit-identical.

Enabled on TPU via EXACTO_TPU_PALLAS_NTT=1 (see exacto_tpu.ring.rns); the
jnp path remains the portable reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is only importable with a TPU-capable jaxlib
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from ..ring import wordops as w


def _stage_fwd(lo, hi, s_lo, s_hi, q, qinv, m, t, bt, n):
    """One forward CT butterfly stage on a [bt, n] tile."""
    lo_r = lo.reshape(bt, m, 2, t)
    hi_r = hi.reshape(bt, m, 2, t)
    u = (lo_r[:, :, 0, :], hi_r[:, :, 0, :])
    s = (s_lo.reshape(1, m, 1), s_hi.reshape(1, m, 1))
    v = w.mont_mul((lo_r[:, :, 1, :], hi_r[:, :, 1, :]), s, q, qinv)
    top = w.mod_add64(u, v, q)
    bot = w.mod_sub64(u, v, q)
    lo = jnp.stack([top[0], bot[0]], axis=2).reshape(bt, n)
    hi = jnp.stack([top[1], bot[1]], axis=2).reshape(bt, n)
    return lo, hi


def _stage_inv(lo, hi, s_lo, s_hi, q, qinv, h, t, bt, n):
    """One inverse GS butterfly stage on a [bt, n] tile."""
    lo_r = lo.reshape(bt, h, 2, t)
    hi_r = hi.reshape(bt, h, 2, t)
    u = (lo_r[:, :, 0, :], hi_r[:, :, 0, :])
    v = (lo_r[:, :, 1, :], hi_r[:, :, 1, :])
    top = w.mod_add64(u, v, q)
    diff = w.mod_sub64(u, v, q)
    s = (s_lo.reshape(1, h, 1), s_hi.reshape(1, h, 1))
    bot = w.mont_mul(diff, s, q, qinv)
    lo = jnp.stack([top[0], bot[0]], axis=2).reshape(bt, n)
    hi = jnp.stack([top[1], bot[1]], axis=2).reshape(bt, n)
    return lo, hi


def _fwd_kernel(consts_ref, lo_ref, hi_ref, psi_lo_ref, psi_hi_ref,
                out_lo_ref, out_hi_ref, *, n, bt):
    q = (consts_ref[0, 0], consts_ref[0, 1])
    qinv = (consts_ref[0, 2], consts_ref[0, 3])
    lo = lo_ref[0]
    hi = hi_ref[0]
    m, t = 1, n
    while m < n:
        t //= 2
        s_lo = psi_lo_ref[0, pl.ds(m, m)]
        s_hi = psi_hi_ref[0, pl.ds(m, m)]
        lo, hi = _stage_fwd(lo, hi, s_lo, s_hi, q, qinv, m, t, bt, n)
        m *= 2
    out_lo_ref[0] = lo
    out_hi_ref[0] = hi


def _inv_kernel(consts_ref, lo_ref, hi_ref, psi_lo_ref, psi_hi_ref,
                out_lo_ref, out_hi_ref, *, n, bt):
    q = (consts_ref[0, 0], consts_ref[0, 1])
    qinv = (consts_ref[0, 2], consts_ref[0, 3])
    ninv = ((consts_ref[0, 4], consts_ref[0, 5]))
    lo = lo_ref[0]
    hi = hi_ref[0]
    t, m = 1, n
    while m > 1:
        h = m // 2
        s_lo = psi_lo_ref[0, pl.ds(h, h)]
        s_hi = psi_hi_ref[0, pl.ds(h, h)]
        lo, hi = _stage_inv(lo, hi, s_lo, s_hi, q, qinv, h, t, bt, n)
        t *= 2
        m = h
    lo, hi = w.mont_mul((lo, hi), (ninv[0], ninv[1]), q, qinv)
    out_lo_ref[0] = lo
    out_hi_ref[0] = hi


def _build_call(kernel, n, bt, L, nb, interpret):
    kfn = partial(kernel, n=n, bt=bt)
    grid = (L, nb)
    specs_in = [
        pl.BlockSpec((1, 8), lambda l, b: (l, 0),
                     memory_space=pltpu.SMEM if pltpu else None),
        pl.BlockSpec((1, bt, n), lambda l, b: (l, b, 0)),
        pl.BlockSpec((1, bt, n), lambda l, b: (l, b, 0)),
        pl.BlockSpec((1, n), lambda l, b: (l, 0)),
        pl.BlockSpec((1, n), lambda l, b: (l, 0)),
    ]
    specs_out = [
        pl.BlockSpec((1, bt, n), lambda l, b: (l, b, 0)),
        pl.BlockSpec((1, bt, n), lambda l, b: (l, b, 0)),
    ]
    return pl.pallas_call(
        kfn,
        grid=grid,
        in_specs=specs_in,
        out_specs=specs_out,
        out_shape=[
            jax.ShapeDtypeStruct((L, nb * bt, n), jnp.uint32),
            jax.ShapeDtypeStruct((L, nb * bt, n), jnp.uint32),
        ],
        interpret=interpret,
    )


def _prep(x, basis):
    """[..., L, n] pair -> ([L, B, n] lo, hi), plus reshape info."""
    lo, hi = x
    n = lo.shape[-1]
    L = lo.shape[-2]
    batch = lo.shape[:-2]
    B = 1
    for s in batch:
        B *= s
    lo2 = jnp.moveaxis(lo.reshape(B, L, n), 1, 0)
    hi2 = jnp.moveaxis(hi.reshape(B, L, n), 1, 0)
    return lo2, hi2, batch, B, L, n


def _consts_table(basis):
    """[L, 8] uint32 SMEM table: q, qinv, ninv as (lo, hi) pairs."""
    return jnp.stack([
        basis.q[0], basis.q[1], basis.qinv[0], basis.qinv[1],
        basis.ninv[0], basis.ninv[1],
        jnp.zeros_like(basis.q[0]), jnp.zeros_like(basis.q[0]),
    ], axis=1)


def _pick_bt(B, n):
    """VMEM tile: keep ~<= 4MB of live u32 data."""
    budget = (1 << 20)  # elements of u32 kept in flight (x2 arrays x temps)
    bt = max(1, min(B, budget // max(n, 1)))
    # power-of-two-ish tiling that divides B
    while B % bt:
        bt -= 1
    return bt


def ntt_fwd_pallas(x, basis, interpret=False):
    """Drop-in for ring.ntt.ntt_fwd on [..., L, n] pairs."""
    lo2, hi2, batch, B, L, n = _prep(x, basis)
    bt = _pick_bt(B, n)
    call = _build_call(_fwd_kernel, n, bt, L, B // bt, interpret)
    out_lo, out_hi = call(_consts_table(basis), lo2, hi2,
                          basis.psi_rev[0], basis.psi_rev[1])
    lo = jnp.moveaxis(out_lo, 0, 1).reshape(*batch, L, n)
    hi = jnp.moveaxis(out_hi, 0, 1).reshape(*batch, L, n)
    return lo, hi


def ntt_inv_pallas(x, basis, interpret=False):
    """Drop-in for ring.ntt.ntt_inv on [..., L, n] pairs."""
    lo2, hi2, batch, B, L, n = _prep(x, basis)
    bt = _pick_bt(B, n)
    call = _build_call(_inv_kernel, n, bt, L, B // bt, interpret)
    out_lo, out_hi = call(_consts_table(basis), lo2, hi2,
                          basis.ipsi_rev[0], basis.ipsi_rev[1])
    lo = jnp.moveaxis(out_lo, 0, 1).reshape(*batch, L, n)
    hi = jnp.moveaxis(out_hi, 0, 1).reshape(*batch, L, n)
    return lo, hi
