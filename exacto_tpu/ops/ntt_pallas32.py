"""Fused single-u32 negacyclic NTT as a Pallas TPU kernel (narrow engine).

The jnp NTT (`ring.wordops32.ntt_fwd32/ntt_inv32`) materializes the whole
tensor in HBM between each of the log2(n) butterfly stages — at n=4096 that
is 12 HBM round trips per transform, and the narrow dBFV multiply is HBM-
bandwidth-bound on exactly this traffic.  This kernel keeps a [bt, n] tile
resident in VMEM across ALL stages: one read + one write per transform.

Mosaic-friendly formulation (the earlier pair-lane kernel failed to lower
because of in-kernel [bt, m, 2, t] reshapes): the tile is laid out
[bt, R, 128] with R = n/128, and every butterfly stage is expressed as
XOR-partner exchange — partner(j) = j ^ t for the power-of-two stride t —
implemented with two static circular rolls plus a select:

  * t < 128  : rolls along the lane axis
  * t >= 128 : rolls along the row (sublane-group) axis by t/128

No reshapes, no strided gathers; only rolls, selects and elementwise
Montgomery arithmetic, all of which Mosaic lowers directly.  Stage twiddles
are precomputed host-side as full per-stage vectors T_s[j] (the group
twiddle broadcast to both elements of each pair) so the butterfly code is
identical at every stage.

Both kernels fold the domain conversions in:

  * forward:  x <- mont_mul(x, s_pre) first (s_pre = R^2 mod q performs
    to-Montgomery; s_pre = R mod q is the identity for already-Montgomery
    inputs), then the CT/LN negacyclic NTT (bit-reversed output, psi
    merged — semantics identical to ntt_fwd32).
  * inverse:  GS stages, then x <- mont_mul(x, s_post) (s_post = n^{-1}
    standard form leaves standard-form output = inverse NTT + from-
    Montgomery fused; s_post = n^{-1} R mod q keeps Montgomery form).

Reference NTT being replaced: /root/reference/src/ring/ntt.rs (concrete-ntt
Plan::fwd/inv); the batching + fusion strategy is the TPU-first redesign
described in SURVEY.md section 7 phase 1.
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

from ..ring import wordops32 as w32

_LANES = 128


def _roll(x, shift, axis):
    """Static circular roll; only the masked-selected side is ever read so
    wrap-around values are don't-cares."""
    if pltpu is not None:
        return pltpu.roll(x, shift, axis)
    return jnp.roll(x, shift, axis)  # pragma: no cover (interpret fallback)


def _partner_uv(x, t, bt, R):
    """(u, v, mask) for the XOR-pair butterfly at stride t on [bt, R, 128].

    mask is True at the low element of each pair (bit t of j clear);
    u = low element, v = high element, both position-aligned with x.
    """
    if t < _LANES:
        col = jax.lax.broadcasted_iota(jnp.uint32, (1, R, _LANES), 2)
        mask = (col & jnp.uint32(t)) == 0
        fwd = _roll(x, -t % _LANES, 2)   # fwd[j] = x[j + t]
        bwd = _roll(x, t, 2)             # bwd[j] = x[j - t]
    else:
        rt = t // _LANES
        row = jax.lax.broadcasted_iota(jnp.uint32, (1, R, _LANES), 1)
        mask = (row & jnp.uint32(rt)) == 0
        fwd = _roll(x, -rt % R, 1)
        bwd = _roll(x, rt, 1)
    u = jnp.where(mask, x, bwd)
    v = jnp.where(mask, fwd, x)
    return u, v, mask


def _fwd_kernel(consts_ref, x_ref, tw_ref, out_ref, *, n, bt):
    l = pl.program_id(0)
    q = consts_ref[l, 0]
    qinv = consts_ref[l, 1]
    s_pre = consts_ref[l, 2]
    R = n // _LANES
    x = w32.mont_mul32(x_ref[:, 0], s_pre, q, qinv)  # [bt, R, 128]
    logn = n.bit_length() - 1
    for s in range(logn):
        t = n >> (s + 1)
        u, v, mask = _partner_uv(x, t, bt, R)
        wv = w32.mont_mul32(v, tw_ref[0, s], q, qinv)
        x = jnp.where(mask, w32.mod_add32(u, wv, q), w32.mod_sub32(u, wv, q))
    out_ref[:, 0] = x


def _inv_kernel(consts_ref, x_ref, tw_ref, out_ref, *, n, bt):
    l = pl.program_id(0)
    q = consts_ref[l, 0]
    qinv = consts_ref[l, 1]
    s_post = consts_ref[l, 3]
    R = n // _LANES
    x = x_ref[:, 0]
    logn = n.bit_length() - 1
    for s in range(logn):
        t = 1 << s
        u, v, mask = _partner_uv(x, t, bt, R)
        tot = w32.mod_add32(u, v, q)
        diff = w32.mont_mul32(w32.mod_sub32(u, v, q), tw_ref[0, s], q, qinv)
        x = jnp.where(mask, tot, diff)
    out_ref[:, 0] = w32.mont_mul32(x, s_post, q, qinv)


@lru_cache(maxsize=None)
def _stage_tables(moduli: tuple, n: int):
    """Host precompute: per-stage full twiddle vectors.

    fwd[s][j] = psi_rev[2^s + (j >> (logn - s))]          (CT stage s)
    inv[s][j] = ipsi_rev[(n >> (s+1)) + (j >> (s+1))]     (GS stage s)
    Returns (fwd [L, S, R, 128], inv [L, S, R, 128], consts [L, 8]) arrays.
    """
    logn = n.bit_length() - 1
    R = n // _LANES
    fwd = np.zeros((len(moduli), logn, n), dtype=np.uint32)
    inv = np.zeros((len(moduli), logn, n), dtype=np.uint32)
    consts = np.zeros((len(moduli), 8), dtype=np.uint32)
    j = np.arange(n)
    for li, q in enumerate(moduli):
        tabs = w32.build_psi_tables32(q, n)
        cc = w32.mont_consts32(q)
        for s in range(logn):
            fwd[li, s] = tabs["psi_rev"][(1 << s) + (j >> (logn - s))]
            inv[li, s] = tabs["ipsi_rev"][(n >> (s + 1)) + (j >> (s + 1))]
        consts[li] = (q, cc["qinv_neg"], 0, 0, cc["r1"], cc["r2"],
                      int(tabs["ninv"]),
                      int(tabs["ninv"]) * pow(1 << 32, -1, q) % q)
    return (fwd.reshape(len(moduli), logn, R, _LANES),
            inv.reshape(len(moduli), logn, R, _LANES),
            consts)


def _consts_with_scalars(consts: np.ndarray, pre_sel: str, post_sel: str):
    """consts[:, 2] = s_pre, consts[:, 3] = s_post per the selector."""
    out = consts.copy()
    sel = {"r1": 4, "r2": 5, "ninv_mont": 6, "ninv_std": 7}
    out[:, 2] = out[:, sel[pre_sel]]
    out[:, 3] = out[:, sel[post_sel]]
    return out[:, :4]


def _pick_bt(B: int, n: int) -> int:
    """Largest divisor of B with tile + temps comfortably inside VMEM."""
    cap = max(1, (4 << 20) // (n * 4 * 8))  # ~8 live tiles within 4MB
    bt = min(B, cap)
    while B % bt:
        bt -= 1
    return bt


@lru_cache(maxsize=None)
def _build(kernel_name: str, n: int, bt: int, L: int, nb: int,
           interpret: bool):
    kernel = {"fwd": _fwd_kernel, "inv": _inv_kernel}[kernel_name]
    R = n // _LANES
    logn = n.bit_length() - 1
    kfn = partial(kernel, n=n, bt=bt)
    smem = pltpu.SMEM if pltpu is not None else None
    vmem = pltpu.VMEM if pltpu is not None else None
    return pl.pallas_call(
        kfn,
        grid=(L, nb),
        in_specs=[
            pl.BlockSpec((L, 4), lambda l, b: (0, 0), memory_space=smem),
            pl.BlockSpec((bt, 1, R, _LANES), lambda l, b: (b, l, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, logn, R, _LANES), lambda l, b: (l, 0, 0, 0),
                         memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((bt, 1, R, _LANES), lambda l, b: (b, l, 0, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((nb * bt, L, R, _LANES), jnp.uint32),
        interpret=interpret,
    )


def _run(kernel_name: str, x, moduli: tuple, pre: str, post: str,
         interpret: bool):
    """x: u32 [..., L, n] -> same shape."""
    n = x.shape[-1]
    L = x.shape[-2]
    batch = x.shape[:-2]
    B = 1
    for s in batch:
        B *= s
    fwd_tw, inv_tw, consts_np = _stage_tables(moduli, n)
    tw = jnp.asarray(fwd_tw if kernel_name == "fwd" else inv_tw)
    consts = jnp.asarray(_consts_with_scalars(consts_np, pre, post))
    R = n // _LANES
    bt = _pick_bt(B, n)
    call = _build(kernel_name, n, bt, L, B // bt, interpret)
    x4 = x.reshape(B, L, R, _LANES)
    out = call(consts, x4, tw)
    return out.reshape(*batch, L, n)


def supported(n: int) -> bool:
    return n >= 2 * _LANES and (n & (n - 1)) == 0


def ntt_fwd32_fused(x, moduli, *, to_mont=False, interpret=False):
    """Forward negacyclic NTT, fused; optionally fold to-Montgomery in."""
    return _run("fwd", x, tuple(moduli), "r2" if to_mont else "r1", "r1",
                interpret)


def ntt_inv32_fused(x, moduli, *, from_mont=False, interpret=False):
    """Inverse negacyclic NTT, fused; optionally fold from-Montgomery in."""
    return _run("inv", x, tuple(moduli), "r1",
                "ninv_std" if from_mont else "ninv_mont", interpret)
