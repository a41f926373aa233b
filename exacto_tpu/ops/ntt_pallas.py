"""Fused negacyclic NTT for the WIDE (u64-pair) engine as a Pallas kernel.

Round 1's version expressed butterflies with in-kernel [bt, m, 2, t]
reshapes, which Mosaic refuses to lower; it shipped dead (interpret-only).
This rewrite ports the XOR-partner roll formulation proven out in
`ops/ntt_pallas32.py` to pair (lo, hi) arithmetic: the tile is [bt, R, 128]
per word, every stage is partner(j) = j ^ t via two static circular rolls
plus a select (t < 128: lane rolls; t >= 128: sublane-row rolls), and the
butterfly is the same 32-bit-lane Montgomery pair code as the jnp path
(`ring.wordops`), so results are bit-identical to `ring.ntt.ntt_fwd/inv`.

The jnp wide NTT materializes the tensor in HBM between all log2(n) stages;
this kernel holds the pair tile in VMEM across every stage — one read and
one write per transform — and folds the to/from-Montgomery conversions in:

  * forward: optional pre-multiply by R^2 (to-Montgomery) for standard-form
    inputs, then CT/LN stages (bit-reversed output, psi merged);
  * inverse: GS stages then multiply by n^{-1} (standard form), which both
    inverts n and strips the Montgomery factor — standard-form output,
    exactly `from_mont(ntt_inv(...))`.

Reference NTT being replaced: /root/reference/src/ring/ntt.rs (concrete-ntt
Plan::fwd/inv) at the reference's own 60-bit moduli.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only imports with a TPU-capable jaxlib
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from ..ring import hostmath as hm
from ..ring import wordops as w

_LANES = 128


def _roll(x, shift, axis):
    if pltpu is not None:
        return pltpu.roll(x, shift, axis)
    return jnp.roll(x, shift, axis)  # pragma: no cover (interpret fallback)


def _partner_pair(lo, hi, t, R):
    """(u, v, mask) pairs for the XOR butterfly at stride t on [bt, R, 128]
    word planes; mask True at the low element of each pair."""
    if t < _LANES:
        col = jax.lax.broadcasted_iota(jnp.uint32, (1, R, _LANES), 2)
        mask = (col & jnp.uint32(t)) == 0
        f_lo, f_hi = (_roll(lo, -t % _LANES, 2), _roll(hi, -t % _LANES, 2))
        b_lo, b_hi = (_roll(lo, t, 2), _roll(hi, t, 2))
    else:
        rt = t // _LANES
        row = jax.lax.broadcasted_iota(jnp.uint32, (1, R, _LANES), 1)
        mask = (row & jnp.uint32(rt)) == 0
        f_lo, f_hi = (_roll(lo, -rt % R, 1), _roll(hi, -rt % R, 1))
        b_lo, b_hi = (_roll(lo, rt, 1), _roll(hi, rt, 1))
    u = (jnp.where(mask, lo, b_lo), jnp.where(mask, hi, b_hi))
    v = (jnp.where(mask, f_lo, lo), jnp.where(mask, f_hi, hi))
    return u, v, mask


def _fwd_kernel(consts_ref, lo_ref, hi_ref, tw_lo_ref, tw_hi_ref,
                twsh_lo_ref, twsh_hi_ref, out_lo_ref, out_hi_ref, *,
                n, bt, pre):
    l = pl.program_id(0)
    q = (consts_ref[l, 0], consts_ref[l, 1])
    qinv = (consts_ref[l, 2], consts_ref[l, 3])
    R = n // _LANES
    logn = n.bit_length() - 1
    lo = lo_ref[:, 0]
    hi = hi_ref[:, 0]
    if pre:  # to-Montgomery: x * R^2 * R^{-1}
        r2 = (consts_ref[l, 4], consts_ref[l, 5])
        lo, hi = w.mont_mul((lo, hi), r2, q, qinv)
    for s in range(logn):
        t = n >> (s + 1)
        u, v, mask = _partner_pair(lo, hi, t, R)
        # 3-mul Shoup twiddle product (standard-form stage vectors) —
        # ROADMAP item 2: the 4-mul Montgomery pair product was ~25% of
        # the butterfly cost
        sv = (tw_lo_ref[0, s], tw_hi_ref[0, s])
        ssh = (twsh_lo_ref[0, s], twsh_hi_ref[0, s])
        wv = w.shoup_mul64(v, sv, ssh, q)
        top = w.mod_add64(u, wv, q)
        bot = w.mod_sub64(u, wv, q)
        lo = jnp.where(mask, top[0], bot[0])
        hi = jnp.where(mask, top[1], bot[1])
    out_lo_ref[:, 0] = lo
    out_hi_ref[:, 0] = hi


def _inv_kernel(consts_ref, lo_ref, hi_ref, tw_lo_ref, tw_hi_ref,
                twsh_lo_ref, twsh_hi_ref, out_lo_ref, out_hi_ref, *,
                n, bt, post):
    l = pl.program_id(0)
    q = (consts_ref[l, 0], consts_ref[l, 1])
    qinv = (consts_ref[l, 2], consts_ref[l, 3])
    R = n // _LANES
    logn = n.bit_length() - 1
    lo = lo_ref[:, 0]
    hi = hi_ref[:, 0]
    for s in range(logn):
        t = 1 << s
        u, v, mask = _partner_pair(lo, hi, t, R)
        top = w.mod_add64(u, v, q)
        diff = w.mod_sub64(u, v, q)
        sv = (tw_lo_ref[0, s], tw_hi_ref[0, s])
        ssh = (twsh_lo_ref[0, s], twsh_hi_ref[0, s])
        bot = w.shoup_mul64(diff, sv, ssh, q)
        lo = jnp.where(mask, top[0], bot[0])
        hi = jnp.where(mask, top[1], bot[1])
    # post scalar: ninv Montgomery pair (keeps Montgomery) or standard-form
    # ninv (fuses from-Montgomery: output standard residues)
    pv = (consts_ref[l, 6], consts_ref[l, 7])
    lo, hi = w.mont_mul((lo, hi), pv, q, qinv)
    out_lo_ref[:, 0] = lo
    out_hi_ref[:, 0] = hi


@lru_cache(maxsize=None)
def _stage_tables(moduli: tuple, n: int):
    """Per-stage full Montgomery twiddle vectors (pair words) + consts.

    fwd[s][j] = psi_rev_mont[2^s + (j >> (logn - s))]
    inv[s][j] = ipsi_rev_mont[(n >> (s+1)) + (j >> (s+1))]
    consts rows: q, qinv_neg, r2, ninv_mont, ninv_std (pairs flattened).
    """
    logn = n.bit_length() - 1
    R = 1 << 64
    j = np.arange(n)
    L = len(moduli)
    fwd = np.zeros((L, logn, n), dtype=np.uint64)
    inv = np.zeros((L, logn, n), dtype=np.uint64)
    fwd_sh = np.zeros((L, logn, n), dtype=np.uint64)
    inv_sh = np.zeros((L, logn, n), dtype=np.uint64)
    consts = np.zeros((L, 10), dtype=np.uint64)
    for li, q in enumerate(moduli):
        psi = hm.psi_2n(q, n)
        ipsi = hm.mod_inv(psi, q)
        # STANDARD-form twiddles + Shoup companions floor(w*2^64/q): the
        # butterflies use the 3-mul Shoup product (Montgomery data stays
        # Montgomery since Shoup has no R^{-1})
        psi_rev = np.zeros(n, dtype=np.uint64)
        ipsi_rev = np.zeros(n, dtype=np.uint64)
        psi_rev_sh = np.zeros(n, dtype=np.uint64)
        ipsi_rev_sh = np.zeros(n, dtype=np.uint64)
        for i in range(n):
            e = hm.bit_reverse(i, logn)
            wv = pow(psi, e, q)
            iv = pow(ipsi, e, q)
            psi_rev[i] = wv
            ipsi_rev[i] = iv
            psi_rev_sh[i] = (wv << 64) // q
            ipsi_rev_sh[i] = (iv << 64) // q
        fidx = [(1 << s) + (j >> (logn - s)) for s in range(logn)]
        iidx = [(n >> (s + 1)) + (j >> (s + 1)) for s in range(logn)]
        for s in range(logn):
            fwd[li, s] = psi_rev[fidx[s]]
            inv[li, s] = ipsi_rev[iidx[s]]
            fwd_sh[li, s] = psi_rev_sh[fidx[s]]
            inv_sh[li, s] = ipsi_rev_sh[iidx[s]]
        qinv = q
        for _ in range(6):
            qinv = (qinv * (2 - q * qinv)) % (1 << 64)
        ninv = hm.mod_inv(n, q)
        consts[li] = (q & 0xFFFFFFFF, q >> 32,
                      (-qinv) % (1 << 64) & 0xFFFFFFFF,
                      ((-qinv) % (1 << 64)) >> 32,
                      (R * R % q) & 0xFFFFFFFF, (R * R % q) >> 32,
                      0, 0,
                      (ninv * R % q) & 0xFFFFFFFF, (ninv * R % q) >> 32)
        # slot 6-7 filled per post mode at call time; 8-9 = ninv Montgomery
        consts[li, 6] = ninv & 0xFFFFFFFF        # standard form (fused)
        consts[li, 7] = ninv >> 32
    sh = (L, logn, n // _LANES, _LANES)

    def pairs(a):
        return ((a & 0xFFFFFFFF).astype(np.uint32),
                (a >> 32).astype(np.uint32))

    return (pairs(fwd.reshape(sh)), pairs(inv.reshape(sh)),
            pairs(fwd_sh.reshape(sh)), pairs(inv_sh.reshape(sh)),
            consts)


def _consts_u32(consts: np.ndarray, post_mont: bool) -> np.ndarray:
    out = np.zeros((consts.shape[0], 8), dtype=np.uint32)
    out[:, 0] = consts[:, 0]
    out[:, 1] = consts[:, 1]
    out[:, 2] = consts[:, 2]
    out[:, 3] = consts[:, 3]
    out[:, 4] = consts[:, 4]
    out[:, 5] = consts[:, 5]
    if post_mont:
        out[:, 6] = consts[:, 8]
        out[:, 7] = consts[:, 9]
    else:
        out[:, 6] = consts[:, 6]
        out[:, 7] = consts[:, 7]
    return out


def _pick_bt(B: int, n: int) -> int:
    """Pair tiles + pair temps: ~16 live [bt, n] u32 planes within ~4MB."""
    cap = max(1, (4 << 20) // (n * 4 * 16))
    bt = min(B, cap)
    while B % bt:
        bt -= 1
    return bt


@lru_cache(maxsize=None)
def _build(kernel_name: str, n: int, bt: int, L: int, nb: int, flag: bool,
           interpret: bool):
    R = n // _LANES
    logn = n.bit_length() - 1
    if kernel_name == "fwd":
        kfn = partial(_fwd_kernel, n=n, bt=bt, pre=flag)
    else:
        kfn = partial(_inv_kernel, n=n, bt=bt, post=flag)
    smem = pltpu.SMEM if pltpu is not None else None
    vmem = pltpu.VMEM if pltpu is not None else None
    tw_spec = pl.BlockSpec((1, logn, R, _LANES), lambda l, b: (l, 0, 0, 0),
                           memory_space=vmem)
    x_spec = pl.BlockSpec((bt, 1, R, _LANES), lambda l, b: (b, l, 0, 0),
                          memory_space=vmem)
    out = jax.ShapeDtypeStruct((nb * bt, L, R, _LANES), jnp.uint32)
    return pl.pallas_call(
        kfn,
        grid=(L, nb),
        in_specs=[
            pl.BlockSpec((L, 8), lambda l, b: (0, 0), memory_space=smem),
            x_spec, x_spec, tw_spec, tw_spec, tw_spec, tw_spec,
        ],
        out_specs=[x_spec, x_spec],
        out_shape=[out, out],
        interpret=interpret,
    )


def supported(n: int) -> bool:
    return n >= 2 * _LANES and (n & (n - 1)) == 0


def _run(kernel_name: str, pair, moduli: tuple, flag: bool, interpret: bool):
    lo, hi = pair
    n = lo.shape[-1]
    L = lo.shape[-2]
    batch = lo.shape[:-2]
    B = 1
    for s in batch:
        B *= s
    ((fwd_lo, fwd_hi), (inv_lo, inv_hi), (fsh_lo, fsh_hi),
     (ish_lo, ish_hi), consts_np) = _stage_tables(moduli, n)
    if kernel_name == "fwd":
        tw = (jnp.asarray(fwd_lo), jnp.asarray(fwd_hi))
        twsh = (jnp.asarray(fsh_lo), jnp.asarray(fsh_hi))
        consts = _consts_u32(consts_np, post_mont=True)  # post unused by fwd
    else:
        tw = (jnp.asarray(inv_lo), jnp.asarray(inv_hi))
        twsh = (jnp.asarray(ish_lo), jnp.asarray(ish_hi))
        # flag = from_mont: standard-form ninv fuses from-Montgomery out
        consts = _consts_u32(consts_np, post_mont=not flag)
    R = n // _LANES
    bt = _pick_bt(B, n)
    call = _build(kernel_name, n, bt, L, B // bt, flag, interpret)
    lo4 = lo.reshape(B, L, R, _LANES)
    hi4 = hi.reshape(B, L, R, _LANES)
    olo, ohi = call(jnp.asarray(consts), lo4, hi4, tw[0], tw[1],
                    twsh[0], twsh[1])
    return (olo.reshape(*batch, L, n), ohi.reshape(*batch, L, n))


def ntt_fwd_fused(pair, moduli, *, to_mont=False, interpret=False):
    """Forward NTT on a (lo, hi) pair [..., L, n]; Montgomery domain
    (optionally folding standard->Montgomery in)."""
    return _run("fwd", pair, tuple(moduli), to_mont, interpret)


def ntt_inv_fused(pair, moduli, *, from_mont=False, interpret=False):
    """Inverse NTT; from_mont=True emits STANDARD-form residues (the
    n^{-1}-standard final multiply strips the Montgomery factor)."""
    return _run("inv", pair, tuple(moduli), from_mont, interpret)
