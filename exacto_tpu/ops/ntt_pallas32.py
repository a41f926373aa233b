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

from ..ring import wordops as w
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


def _fwd_kernel(consts_ref, x_ref, tw_ref, twsh_ref, out_ref, *, n, bt,
                lazy):
    l = pl.program_id(0)
    q = consts_ref[l, 0]
    pre_w = consts_ref[l, 2]
    pre_sh = consts_ref[l, 3]
    x = w32.shoup_mul32(x_ref[:, 0], pre_w, pre_sh, q)  # [bt, R, 128]
    out_ref[:, 0] = _fwd_stages(x, tw_ref, twsh_ref, q, n=n, bt=bt,
                                lazy=lazy)


def _lazy_shoup(v, w, wsh, q):
    """Shoup product WITHOUT the final conditional subtract: result in
    [0, 2q) for any u32 v (Harvey).  Only safe when the consumer tolerates
    the redundant representation, i.e. q < 2^30 lazy butterfly chains."""
    return v * w - w32.mulhi32(v, wsh) * q


def _fwd_stages(x, tw_ref, twsh_ref, q, *, n, bt, tw_l=0, lazy=False):
    """CT/LN forward butterfly stages on a VMEM-resident [bt, R, 128] tile.

    Twiddle products use the 3-mul Shoup form (standard-form stage vectors
    in tw_ref + floor(w*2^32/q) companions in twsh_ref) — Montgomery-domain
    data stays Montgomery, and each butterfly drops from 10 to 6 native u32
    multiplies vs mont_mul32.  With `lazy` (requires q < 2^30 so 4q < 2^32)
    values ride in [0, 2q) through all stages — the Shoup subtract drops
    from every twiddle product — and one final select normalizes to [0, q).
    tw_l selects the limb row when the refs hold several limbs."""
    R = n // _LANES
    logn = n.bit_length() - 1
    if not lazy:
        for s in range(logn):
            t = n >> (s + 1)
            u, v, mask = _partner_uv(x, t, bt, R)
            wv = w32.shoup_mul32(v, tw_ref[tw_l, s], twsh_ref[tw_l, s], q)
            x = jnp.where(mask, w32.mod_add32(u, wv, q),
                          w32.mod_sub32(u, wv, q))
        return x
    q2 = q + q
    for s in range(logn):
        t = n >> (s + 1)
        # The stage twiddle is PAIR-CONSTANT (tw[s][j] == tw[s][j^t]: the
        # differing bit is shifted out of the table index), so the product
        # can be taken BEFORE the partner exchange: P[j] = w*x[j] on every
        # lane, then the low lane reads its partner's product via the same
        # roll the value exchange used.  ONE select/stage (both branch sums
        # computed, selected once) + one umin reduction — measured VPU unit
        # costs (utils/roofline.py) put one compare-select above one full
        # multiply, so selects, not products, are the butterfly's cost
        # center.
        #   low  j: x[j] + w*x[j^t]        = x + roll_f(P)
        #   high j: x[j^t] + 2q - w*x[j]   = roll_b(x) + (2q - P)
        P = _lazy_shoup(x, tw_ref[tw_l, s], twsh_ref[tw_l, s], q)  # [0,2q)
        if t < _LANES:
            col = jax.lax.broadcasted_iota(jnp.uint32, (1, R, _LANES), 2)
            mask = (col & jnp.uint32(t)) == 0
            s_low = x + _roll(P, -t % _LANES, 2)
            s_high = _roll(x, t, 2) + (q2 - P)
        else:
            rt = t // _LANES
            row = jax.lax.broadcasted_iota(jnp.uint32, (1, R, _LANES), 1)
            mask = (row & jnp.uint32(rt)) == 0
            s_low = x + _roll(P, -rt % R, 1)
            s_high = _roll(x, rt, 1) + (q2 - P)
        s_ = jnp.where(mask, s_low, s_high)  # < 4q < 2^32
        x = w32.cond_sub32(s_, q2)
    return w32.cond_sub32(x, q)


def _extend_kernel(consts_ref, x_ref, tw_ref, twsh_ref, out_ref, *, n, bt,
                   glob):
    """Fused centered base-extension Q -> p_l + forward NTT.

    Prologue (was `narrow._extend_to_aux`'s jnp sweep): CRT-compose the two
    ct-prime residues to t mod Q (u64 pair), center around Q/2, reduce the
    magnitude mod this grid-step's aux prime, fix the sign, convert to
    Montgomery — all on the VMEM tile — then run the butterfly stages.  One
    HBM read of the 2-limb residues + one write of the NTT output replaces
    the compose/reduce sweep AND the NTT kernel's own input pass.

    `glob` bakes the ct-basis constants (static per params): q0, q1, the
    CRT inverse factors with Shoup companions, Q and Q/2 as u32 pairs.
    Reference being fused: base_extend_centered, /root/reference/src/bfv/
    eval.rs:217-247 (there a per-coefficient scalar loop).
    """
    l = pl.program_id(0)
    q = consts_ref[l, 0]
    r1 = consts_ref[l, 4]
    r1_sh = consts_ref[l, 5]
    one_sh = consts_ref[l, 6]
    u32 = jnp.uint32
    res0 = x_ref[:, 0]  # [bt, R, 128] standard-form residues mod q0
    res1 = x_ref[:, 1]
    y0 = w32.shoup_mul32(res0, u32(glob["inv0"]), u32(glob["inv0_sh"]),
                         u32(glob["q0"]))
    y1 = w32.shoup_mul32(res1, u32(glob["inv1"]), u32(glob["inv1_sh"]),
                         u32(glob["q1"]))
    # t = y0*(Q/q0) + y1*(Q/q1) - {0,1}*Q; Q/q_i < 2^31 so each product is
    # a 62-bit pair and the sum < 2Q < 2^63 (no 128-bit carry chain needed)
    p0 = w32.mul32_full(y0, u32(glob["q1"]))  # Q/q0 = q1
    p1 = w32.mul32_full(y1, u32(glob["q0"]))
    x64 = w.add64(p0, p1)
    qp = (u32(glob["q_lo"]), u32(glob["q_hi"]))
    half = (u32(glob["h_lo"]), u32(glob["h_hi"]))
    x64 = w.select64(w.ge64(x64, qp), w.sub64(x64, qp), x64)
    neg = w.gt64(x64, half)
    mag = w.select64(neg, w.sub64(qp, x64), x64)
    red = w32.reduce_u64_shoup32(mag[0], mag[1], q, r1, r1_sh, one_sh)
    xq = jnp.where(neg, w32.mod_neg32(red, q), red)
    x = w32.shoup_mul32(xq, r1, r1_sh, q)  # to-Montgomery (x * R)
    out_ref[:, 0] = _fwd_stages(x, tw_ref, twsh_ref, q, n=n, bt=bt,
                                lazy=glob["lazy_aux"])


def _relin_kernel(consts_ref, x_ref, rlk0_ref, rlk1_ref, tw_ref, twsh_ref,
                  out0_ref, out1_ref, *, n, bt, D, log_b, glob):
    """Fused relinearization inner product for one ct limb.

    Prologue composes the c2 coefficient residues to t mod Q (as in
    `_extend_kernel`) and centers; then for each gadget digit i: balanced
    digit extraction (sequential borrow chain, exactly
    `narrow._gadget_digits32`), forward NTT of the digit plane, Montgomery
    dot with rlk0/rlk1 digit i, accumulate.  Emits (sum_i d_i*rlk0_i,
    sum_i d_i*rlk1_i) — the whole gadget keyswitch inner product
    (reference: relinearize, /root/reference/src/bfv/keyswitch.rs:59-101)
    with zero intermediate HBM traffic.
    """
    l = pl.program_id(0)
    q = consts_ref[l, 0]
    qinv = consts_ref[l, 1]
    r1 = consts_ref[l, 4]
    r1_sh = consts_ref[l, 5]
    u32 = jnp.uint32
    res0 = x_ref[:, 0]
    res1 = x_ref[:, 1]
    y0 = w32.shoup_mul32(res0, u32(glob["inv0"]), u32(glob["inv0_sh"]),
                         u32(glob["q0"]))
    y1 = w32.shoup_mul32(res1, u32(glob["inv1"]), u32(glob["inv1_sh"]),
                         u32(glob["q1"]))
    p0 = w32.mul32_full(y0, u32(glob["q1"]))
    p1 = w32.mul32_full(y1, u32(glob["q0"]))
    x64 = w.add64(p0, p1)
    qp = (u32(glob["q_lo"]), u32(glob["q_hi"]))
    half = (u32(glob["h_lo"]), u32(glob["h_hi"]))
    x64 = w.select64(w.ge64(x64, qp), w.sub64(x64, qp), x64)
    neg = w.gt64(x64, half)
    mag = w.select64(neg, w.sub64(qp, x64), x64)

    half_b = u32(1 << (log_b - 1))
    bmask = u32((1 << log_b) - 1)
    acc0 = acc1 = None
    carry = jnp.zeros_like(res0)
    for i in range(D):
        raw = w.shr64(mag, i * log_b)[0] & bmask
        v = raw + carry
        ge = v >= half_b
        dmag = jnp.where(ge, (u32(1) << u32(log_b)) - v, v)
        carry = ge.astype(jnp.uint32)
        fneg = ge ^ neg
        val = jnp.where(fneg & (dmag != 0), q - dmag, dmag)
        xd = w32.shoup_mul32(val, r1, r1_sh, q)  # to-Montgomery (x * R)
        yd = _fwd_stages(xd, tw_ref, twsh_ref, q, n=n, bt=bt,
                         lazy=max(glob["q0"], glob["q1"]) < (1 << 30))
        t0 = w32.mont_mul32(yd, rlk0_ref[i, 0], q, qinv)
        t1 = w32.mont_mul32(yd, rlk1_ref[i, 0], q, qinv)
        acc0 = t0 if acc0 is None else w32.mod_add32(acc0, t0, q)
        acc1 = t1 if acc1 is None else w32.mod_add32(acc1, t1, q)
    out0_ref[:, 0] = acc0
    out1_ref[:, 0] = acc1


def _inv_stages(x, tw_ref, twsh_ref, q, post_w, post_sh, *, n, bt, tw_l=0,
                lazy=False):
    """GS inverse butterfly stages + fused final scalar multiply on a
    VMEM-resident [bt, R, 128] tile, Shoup twiddle products throughout.
    `lazy` (q < 2^30) rides values in [0, 2q); the final exact Shoup
    multiply normalizes to [0, q) for free.  tw_l selects the limb row
    when the twiddle refs hold several limbs."""
    R = n // _LANES
    logn = n.bit_length() - 1
    if not lazy:
        for s in range(logn):
            t = 1 << s
            u, v, mask = _partner_uv(x, t, bt, R)
            tot = w32.mod_add32(u, v, q)
            diff = w32.shoup_mul32(w32.mod_sub32(u, v, q), tw_ref[tw_l, s],
                                   twsh_ref[tw_l, s], q)
            x = jnp.where(mask, tot, diff)
        return w32.shoup_mul32(x, post_w, post_sh, q)
    q2 = q + q
    for s in range(logn):
        t = 1 << s
        # Pair-constant twiddle (see _fwd_stages): compute the stage from
        # two rolls and TWO selects instead of four.
        #   low  j: x[j] + x[j^t]                    = x + roll_f(x)
        #   high j: w*(x[j^t] - x[j] + 2q)           = lazy_shoup(D)
        # D = roll_b(x) + 2q - x < 4q < 2^32; Harvey's bound holds for any
        # u32 input, so no pre-normalization is needed.
        if t < _LANES:
            col = jax.lax.broadcasted_iota(jnp.uint32, (1, R, _LANES), 2)
            mask = (col & jnp.uint32(t)) == 0
            s_ = x + _roll(x, -t % _LANES, 2)
            dv = _roll(x, t, 2) + q2 - x
        else:
            rt = t // _LANES
            row = jax.lax.broadcasted_iota(jnp.uint32, (1, R, _LANES), 1)
            mask = (row & jnp.uint32(rt)) == 0
            s_ = x + _roll(x, -rt % R, 1)
            dv = _roll(x, rt, 1) + q2 - x
        tot = w32.cond_sub32(s_, q2)
        diff = _lazy_shoup(dv, tw_ref[tw_l, s], twsh_ref[tw_l, s], q)
        x = jnp.where(mask, tot, diff)
    return w32.shoup_mul32(x, post_w, post_sh, q)  # exact: [0, q) out


def _inv_kernel(consts_ref, x_ref, tw_ref, twsh_ref, out_ref, *, n, bt,
                lazy):
    l = pl.program_id(0)
    q = consts_ref[l, 0]
    post_w = consts_ref[l, 4]
    post_sh = consts_ref[l, 5]
    out_ref[:, 0] = _inv_stages(x_ref[:, 0], tw_ref, twsh_ref, q, post_w,
                                post_sh, n=n, bt=bt, lazy=lazy)


@lru_cache(maxsize=None)
def _limb_consts(moduli: tuple, n: int):
    """Per-limb scalar consts [L, 10] only (no stage twiddle tables):
    (q, qinv_neg, r1, r1_sh, one_sh[=shoup(1)], ninv_fuse, ninv_fuse_sh,
    ninv_mont, ninv_mont_sh, 0).  Scalars inline into HLO harmlessly; the
    big [L, S, n] twiddle tables must instead arrive as DEVICE OPERANDS
    (NarrowBasis.stw_*) — inlining them as jit constants blows the remote
    compile service's payload limit at n >= 16384 (observed HTTP 413)."""
    consts = np.zeros((len(moduli), 10), dtype=np.uint32)
    for li, q in enumerate(moduli):
        tabs = w32.build_psi_tables32(q, n)
        cc = w32.mont_consts32(q)
        ninv_mont = int(tabs["ninv"])
        consts[li] = (q, cc["qinv_neg"], cc["r1"], cc["r1_shoup"],
                      cc["one_shoup"], int(tabs["ninv_fuse"]),
                      int(tabs["ninv_fuse_shoup"]), ninv_mont,
                      (ninv_mont << 32) // q, 0)
    return consts


def stage_twiddle_indices(n: int):
    """[logn, n] gather indices into psi_std / ipsi_std for the per-stage
    twiddle vectors (host-side _stage_tables path)."""
    logn = n.bit_length() - 1
    j = np.arange(n)
    fidx = np.stack([(1 << s) + (j >> (logn - s)) for s in range(logn)])
    iidx = np.stack([(n >> (s + 1)) + (j >> (s + 1)) for s in range(logn)])
    return fidx, iidx


def stage_tables_from_basis(basis, which: str):
    """Per-stage twiddle operands [L, logn, n] derived IN-TRACE from the
    basis' [L, n] psi tables by slice+repeat (pure broadcast/reshape — no
    gather, no inline constants).

    Why in-trace instead of persistent NarrowBasis fields: the tables must
    be jit OPERANDS (inlined constants blow the remote compile payload at
    n >= 16384, HTTP 413), but persisting [L, S, n] per basis OOMs the
    chip when the bootstrap's modswitch chain materializes params at
    every prime level (observed RESOURCE_EXHAUSTED, round-5 first
    u64chain attempt).  Derived here, the tables are transient per
    compiled program, deduplicated by XLA CSE across calls, and cost one
    broadcast per program execution.

    Index identities (see stage_twiddle_indices): CT stage s reads
    psi[2^s + (j >> (logn-s))] — i.e. psi[2^s : 2^(s+1)] with each entry
    repeated n >> s times; GS stage s reads ipsi[(n >> (s+1)) + (j >>
    (s+1))] — ipsi[n>>(s+1) : n>>s] with each entry repeated 2^(s+1)
    times."""
    if which == "fwd":
        tabs = (basis.psi_std, basis.psi_shoup)
    else:
        tabs = (basis.ipsi_std, basis.ipsi_shoup)
    n = tabs[0].shape[-1]
    logn = n.bit_length() - 1
    out = []
    for tab in tabs:
        if which == "fwd":
            stages = [jnp.repeat(tab[:, (1 << s):(2 << s)], n >> s, axis=1)
                      for s in range(logn)]
        else:
            stages = [jnp.repeat(tab[:, (n >> (s + 1)):(n >> s)],
                                 1 << (s + 1), axis=1)
                      for s in range(logn)]
        out.append(jnp.stack(stages, axis=1))  # [L, logn, n]
    return tuple(out)


@lru_cache(maxsize=None)
def _stage_tables(moduli: tuple, n: int):
    """Host precompute: per-stage full twiddle vectors, STANDARD form with
    Shoup companions (floor(w*2^32/q)).

    fwd[s][j] = psi_std[2^s + (j >> (logn - s))]          (CT stage s)
    inv[s][j] = ipsi_std[(n >> (s+1)) + (j >> (s+1))]     (GS stage s)
    Returns (fwd, fwd_sh, inv, inv_sh [L, S, R, 128], consts [L, 10]):
    consts = (q, qinv_neg, r1, r1_sh, one_sh[=shoup(1)], ninv_fuse,
              ninv_fuse_sh, ninv_mont, ninv_mont_sh, 0), where the pre/post
    scalar multiplies are Shoup pairs: to-Montgomery = (r1, r1_sh) [x*R],
    identity = (1, one_sh), from-Montgomery-fused inverse = ninv_fuse
    [n^{-1}R^{-1}], Montgomery-preserving inverse = ninv_mont [n^{-1}R].
    """
    logn = n.bit_length() - 1
    R = n // _LANES
    fwd = np.zeros((len(moduli), logn, n), dtype=np.uint32)
    fwd_sh = np.zeros((len(moduli), logn, n), dtype=np.uint32)
    inv = np.zeros((len(moduli), logn, n), dtype=np.uint32)
    inv_sh = np.zeros((len(moduli), logn, n), dtype=np.uint32)
    fidx, iidx = stage_twiddle_indices(n)
    for li, q in enumerate(moduli):
        tabs = w32.build_psi_tables32(q, n)
        fwd[li] = tabs["psi_std"][fidx]
        fwd_sh[li] = tabs["psi_shoup"][fidx]
        inv[li] = tabs["ipsi_std"][iidx]
        inv_sh[li] = tabs["ipsi_shoup"][iidx]
    consts = _limb_consts(moduli, n)
    sh = (len(moduli), logn, R, _LANES)
    return (fwd.reshape(sh), fwd_sh.reshape(sh), inv.reshape(sh),
            inv_sh.reshape(sh), consts)


def _consts_with_scalars(consts: np.ndarray, pre_sel: str, post_sel: str):
    """consts[:, 2:4] = (pre_w, pre_sh), consts[:, 4:6] = (post_w, post_sh)
    per the selector (Shoup pairs)."""
    out = consts[:, :6].copy()
    sel = {"to_mont": (2, 3), "identity": None, "ninv_fuse": (5, 6),
           "ninv_mont": (7, 8)}
    pre = sel[pre_sel]
    if pre is None:
        out[:, 2] = 1
        out[:, 3] = consts[:, 4]  # shoup(1) = floor(2^32/q)
    else:
        out[:, 2] = consts[:, pre[0]]
        out[:, 3] = consts[:, pre[1]]
    post = sel[post_sel]
    if post is None:
        out[:, 4] = 1
        out[:, 5] = consts[:, 4]
    else:
        out[:, 4] = consts[:, post[0]]
        out[:, 5] = consts[:, post[1]]
    return out


def _mosaic_params() -> dict:
    """kwargs for pallas_call raising Mosaic's scoped-VMEM limit.

    The default scoped limit is 16 MB; v5e has 128 MB of physical VMEM, and
    the ILP-bound kernels (relin: sequential digit loop) want tiles well
    past 16 MB once EXACTO_TPU_VMEM_MB raises the tile budget.  The limit
    is a guard, not an allocation — Mosaic still only uses what the tiling
    needs."""
    if pltpu is None:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 << 20)}


def _bt_override(B: int, vmem_cap: int) -> int | None:
    """EXACTO_TPU_BT=k forces the batch-tile size (perf sweeps); clamped to
    a divisor of B and to the kernel's VMEM-derived cap so a leftover env
    var can't push tiles past VMEM or crash on a non-numeric value."""
    import os
    import warnings

    v = os.environ.get("EXACTO_TPU_BT")
    if not v:
        return None
    try:
        req = int(v)
    except ValueError:
        warnings.warn("EXACTO_TPU_BT=%r is not an integer; ignoring" % v)
        return None
    bt = min(B, max(1, req))
    if bt > vmem_cap:
        warnings.warn("EXACTO_TPU_BT=%d exceeds the VMEM-derived tile cap "
                      "%d; clamping" % (req, vmem_cap))
        bt = vmem_cap
    while B % bt:
        bt -= 1
    return bt


def _vmem_budget() -> int:
    """VMEM byte budget for tile sizing.  Default 4 MB is deliberately
    conservative; EXACTO_TPU_VMEM_MB overrides for tuning sweeps (v5e has
    far more VMEM than 4 MB — bigger tiles mean fewer grid programs and
    more independent element rows in flight, which is what the ILP-bound
    kernels like relin need)."""
    import os

    raw = os.environ.get("EXACTO_TPU_VMEM_MB")
    if raw:
        try:
            return int(float(raw) * (1 << 20))
        except ValueError:
            pass
    return 4 << 20


def _pick_bt(B: int, n: int) -> int:
    """Largest divisor of B with tile + temps comfortably inside VMEM."""
    cap = max(1, _vmem_budget() // (n * 4 * 8))  # ~8 live tiles
    ov = _bt_override(B, cap)
    if ov is not None:
        return ov
    bt = min(B, cap)
    while B % bt:
        bt -= 1
    return bt


@lru_cache(maxsize=None)
def _build(kernel_name: str, n: int, bt: int, L: int, nb: int,
           lazy: bool, interpret: bool):
    kernel = {"fwd": _fwd_kernel, "inv": _inv_kernel}[kernel_name]
    R = n // _LANES
    logn = n.bit_length() - 1
    kfn = partial(kernel, n=n, bt=bt, lazy=lazy)
    smem = pltpu.SMEM if pltpu is not None else None
    vmem = pltpu.VMEM if pltpu is not None else None
    tw_spec = pl.BlockSpec((1, logn, R, _LANES), lambda l, b: (l, 0, 0, 0),
                           memory_space=vmem)
    return pl.pallas_call(
        kfn,
        grid=(L, nb),
        in_specs=[
            pl.BlockSpec((L, 6), lambda l, b: (0, 0), memory_space=smem),
            pl.BlockSpec((bt, 1, R, _LANES), lambda l, b: (b, l, 0, 0),
                         memory_space=vmem),
            tw_spec,
            tw_spec,
        ],
        out_specs=pl.BlockSpec((bt, 1, R, _LANES), lambda l, b: (b, l, 0, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((nb * bt, L, R, _LANES), jnp.uint32),
        interpret=interpret,
        **_mosaic_params(),
    )


def _run(kernel_name: str, x, moduli: tuple, pre: str, post: str,
         interpret: bool, tables=None):
    """x: u32 [..., L, n] -> same shape.

    `tables` = (tw, tw_shoup) DEVICE arrays [L, logn, n] (e.g.
    NarrowBasis.stw_fwd/stw_fwd_sh) — passing them keeps the big twiddle
    tables out of the traced HLO (see _limb_consts); without them the
    host-side _stage_tables constants are inlined (fine for small n /
    direct kernel tests)."""
    n = x.shape[-1]
    L = x.shape[-2]
    batch = x.shape[:-2]
    B = 1
    for s in batch:
        B *= s
    logn = n.bit_length() - 1
    R = n // _LANES
    if tables is not None:
        tw, twsh = tables
        tw = tw.reshape(L, logn, R, _LANES)
        twsh = twsh.reshape(L, logn, R, _LANES)
        consts_np = _limb_consts(moduli, n)
    else:
        fwd_tw, fwd_sh, inv_tw, inv_sh, consts_np = _stage_tables(moduli, n)
        if kernel_name == "fwd":
            tw, twsh = jnp.asarray(fwd_tw), jnp.asarray(fwd_sh)
        else:
            tw, twsh = jnp.asarray(inv_tw), jnp.asarray(inv_sh)
    consts = jnp.asarray(_consts_with_scalars(consts_np, pre, post))
    bt = _pick_bt(B, n)
    lazy = max(moduli) < (1 << 30)
    call = _build(kernel_name, n, bt, L, B // bt, lazy, interpret)
    x4 = x.reshape(B, L, R, _LANES)
    out = call(consts, x4, tw, twsh)
    return out.reshape(*batch, L, n)


def supported(n: int) -> bool:
    return n >= 2 * _LANES and (n & (n - 1)) == 0


@lru_cache(maxsize=None)
def _extend_tables(ct_moduli: tuple, aux_moduli: tuple, n: int):
    """Per-aux-limb consts [A, 8] + baked ct-basis globals for the fused
    extend kernel."""
    from ..ring import hostmath as hm

    q0, q1 = ct_moduli
    big_q = q0 * q1
    inv0 = hm.mod_inv(q1 % q0, q0)  # (Q/q0)^{-1} mod q0
    inv1 = hm.mod_inv(q0 % q1, q1)
    glob = {
        "q0": q0, "q1": q1,
        "inv0": inv0, "inv0_sh": w32.shoup_const32(inv0, q0),
        "inv1": inv1, "inv1_sh": w32.shoup_const32(inv1, q1),
        "q_lo": big_q & 0xFFFFFFFF, "q_hi": big_q >> 32,
        "h_lo": (big_q // 2) & 0xFFFFFFFF, "h_hi": (big_q // 2) >> 32,
        "lazy_aux": all(m < (1 << 30) for m in aux_moduli),
    }
    consts = np.zeros((len(aux_moduli), 8), dtype=np.uint32)
    for li, p in enumerate(aux_moduli):
        cc = w32.mont_consts32(p)
        consts[li] = (p, cc["qinv_neg"], cc["r2"], 0, cc["r1"],
                      cc["r1_shoup"], cc["one_shoup"], 0)
    return consts, tuple(sorted(glob.items()))


@lru_cache(maxsize=None)
def _build_extend(n: int, bt: int, A: int, nb: int, glob_items: tuple,
                  interpret: bool):
    R = n // _LANES
    logn = n.bit_length() - 1
    kfn = partial(_extend_kernel, n=n, bt=bt, glob=dict(glob_items))
    smem = pltpu.SMEM if pltpu is not None else None
    vmem = pltpu.VMEM if pltpu is not None else None
    tw_spec = pl.BlockSpec((1, logn, R, _LANES), lambda l, b: (l, 0, 0, 0),
                           memory_space=vmem)
    return pl.pallas_call(
        kfn,
        grid=(A, nb),
        in_specs=[
            pl.BlockSpec((A, 8), lambda l, b: (0, 0), memory_space=smem),
            # both ct-limb residue planes, identical for every aux limb
            pl.BlockSpec((bt, 2, R, _LANES), lambda l, b: (b, 0, 0, 0),
                         memory_space=vmem),
            tw_spec,
            tw_spec,
        ],
        out_specs=pl.BlockSpec((bt, 1, R, _LANES), lambda l, b: (b, l, 0, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((nb * bt, A, R, _LANES), jnp.uint32),
        interpret=interpret,
        **_mosaic_params(),
    )


@lru_cache(maxsize=None)
def _build_relin(n: int, bt: int, L: int, nb: int, D: int, log_b: int,
                 glob_items: tuple, interpret: bool):
    R = n // _LANES
    logn = n.bit_length() - 1
    kfn = partial(_relin_kernel, n=n, bt=bt, D=D, log_b=log_b,
                  glob=dict(glob_items))
    smem = pltpu.SMEM if pltpu is not None else None
    vmem = pltpu.VMEM if pltpu is not None else None
    out = jax.ShapeDtypeStruct((nb * bt, L, R, _LANES), jnp.uint32)
    tw_spec = pl.BlockSpec((1, logn, R, _LANES), lambda l, b: (l, 0, 0, 0),
                           memory_space=vmem)
    return pl.pallas_call(
        kfn,
        grid=(L, nb),
        in_specs=[
            pl.BlockSpec((L, 8), lambda l, b: (0, 0), memory_space=smem),
            pl.BlockSpec((bt, 2, R, _LANES), lambda l, b: (b, 0, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((D, 1, R, _LANES), lambda l, b: (0, l, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((D, 1, R, _LANES), lambda l, b: (0, l, 0, 0),
                         memory_space=vmem),
            tw_spec,
            tw_spec,
        ],
        out_specs=[
            pl.BlockSpec((bt, 1, R, _LANES), lambda l, b: (b, l, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((bt, 1, R, _LANES), lambda l, b: (b, l, 0, 0),
                         memory_space=vmem),
        ],
        out_shape=[out, out],
        interpret=interpret,
        **_mosaic_params(),
    )


def _extend3_kernel(x_ref, tw_ref, twsh_ref, out_ref, *, n, bt, glob, aux):
    """Centered base extension emitting ALL aux limbs from one compose.

    Unlike `_extend_kernel` (gridded per aux limb, compose replicated —
    measured regression), this grids over batch only: one CRT compose +
    centering per tile, then per aux prime a reduce + to-Montgomery +
    forward NTT, all VMEM-resident.  `aux` bakes per-prime constants
    (p, qinv_neg, r2, r1, r1_sh, one_sh)."""
    u32 = jnp.uint32
    (q0, q1, inv0, inv0_sh, inv1, inv1_sh,
     q_lo, q_hi, h_lo, h_hi) = glob
    res0 = x_ref[:, 0]
    res1 = x_ref[:, 1]
    y0 = w32.shoup_mul32(res0, u32(inv0), u32(inv0_sh), u32(q0))
    y1 = w32.shoup_mul32(res1, u32(inv1), u32(inv1_sh), u32(q1))
    x64 = w.add64(w32.mul32_full(y0, u32(q1)), w32.mul32_full(y1, u32(q0)))
    qp = (u32(q_lo), u32(q_hi))
    half = (u32(h_lo), u32(h_hi))
    x64 = w.select64(w.ge64(x64, qp), w.sub64(x64, qp), x64)
    neg = w.gt64(x64, half)
    mag = w.select64(neg, w.sub64(qp, x64), x64)
    for j, ax in enumerate(aux):
        pj = u32(ax[0])
        r1j, r1shj = u32(ax[3]), u32(ax[4])
        red = w32.reduce_u64_shoup32(mag[0], mag[1], pj, r1j, r1shj,
                                     u32(ax[5]))
        xq = jnp.where(neg, w32.mod_neg32(red, pj), red)
        xm = w32.shoup_mul32(xq, r1j, r1shj, pj)  # to-Montgomery (x * R)
        out_ref[:, j] = _fwd_stages(xm, tw_ref, twsh_ref, pj, n=n, bt=bt,
                                    tw_l=j,
                                    lazy=all(a[0] < (1 << 30) for a in aux))


@lru_cache(maxsize=None)
def _build_extend3(n: int, bt: int, A: int, nb: int, glob: tuple,
                   aux: tuple, interpret: bool):
    R = n // _LANES
    logn = n.bit_length() - 1
    kfn = partial(_extend3_kernel, n=n, bt=bt, glob=glob, aux=aux)
    vmem = pltpu.VMEM if pltpu is not None else None
    tw_spec = pl.BlockSpec((A, logn, R, _LANES), lambda b: (0, 0, 0, 0),
                           memory_space=vmem)
    return pl.pallas_call(
        kfn,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, 2, R, _LANES), lambda b: (b, 0, 0, 0),
                         memory_space=vmem),
            tw_spec,
            tw_spec,
        ],
        out_specs=pl.BlockSpec((bt, A, R, _LANES), lambda b: (b, 0, 0, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((nb * bt, A, R, _LANES), jnp.uint32),
        interpret=interpret,
        **_mosaic_params(),
    )


def extend3_ntt_fused(res, ct_moduli, aux_moduli, *, interpret=False,
                      tables=None):
    """Batch-gridded fused base extension Q -> P + aux forward NTTs.

    Same contract as `extend_ntt_fused` (res [..., 2, n] standard residues
    -> [..., A, n] NTT-Montgomery aux polys), but the compose prologue runs
    once per batch tile instead of once per aux limb.  `tables` = the aux
    basis (stw_fwd, stw_fwd_sh) device arrays [A, logn, n]."""
    ct_moduli, aux_moduli = tuple(ct_moduli), tuple(aux_moduli)
    n = res.shape[-1]
    batch = res.shape[:-2]
    B = 1
    for s in batch:
        B *= s
    A = len(aux_moduli)
    logn = n.bit_length() - 1
    consts_np, glob_items = _extend_tables(ct_moduli, aux_moduli, n)
    g = dict(glob_items)
    glob = (g["q0"], g["q1"], g["inv0"], g["inv0_sh"], g["inv1"],
            g["inv1_sh"], g["q_lo"], g["q_hi"], g["h_lo"], g["h_hi"])
    # rows are (p, qinv_neg, r2, 0, r1, r1_shoup, one_shoup, 0); the kernel
    # wants (p, qinv_neg, r2, r1, r1_sh, one_sh)
    aux = tuple(tuple(int(row[k]) for k in (0, 1, 2, 4, 5, 6))
                for row in consts_np)
    R = n // _LANES
    if tables is not None:
        fwd_tw = tables[0].reshape(A, logn, R, _LANES)
        fwd_sh = tables[1].reshape(A, logn, R, _LANES)
    else:
        fwd_tw, fwd_sh, _, _, _ = _stage_tables(aux_moduli, n)
        fwd_tw, fwd_sh = jnp.asarray(fwd_tw), jnp.asarray(fwd_sh)
    bt = _pick_bt_hps(B, n)
    call = _build_extend3(n, bt, A, B // bt, glob, aux, interpret)
    out = call(res.reshape(B, 2, R, _LANES), fwd_tw, fwd_sh)
    return out.reshape(*batch, A, n)


def _hps_kernel(tq_ref, tp_ref, itwq_ref, itwq_sh_ref, itwp_ref,
                itwp_sh_ref, ftwq_ref, ftwq_sh_ref, out_ref, *,
                n, bt, glob, eval_out):
    """Whole HPS scale for one batch tile, all limbs VMEM-resident.

    INTT the 2 ct-limb and A aux-limb tensor planes, then run the exact
    narrow HPS glue (CRT compose -> centered magnitude -> per-aux m_j ->
    Garner mixed-radix digits -> sign -> 64x128 fixed-point round -> Horner
    assembly per ct prime; `narrow._narrow_hps_scale`), then (eval_out)
    forward-NTT both ct output limbs.  Grid is over BATCH ONLY so the glue
    runs once per tile — the lesson from the extend-prologue regression.
    Reference: hps_scale, /root/reference/src/bfv/eval.rs:257-413."""
    u32 = jnp.uint32
    (q0, q1, inv0, inv0_sh, inv1, inv1_sh,
     q_lo, q_hi, h_lo, h_hi) = glob["compose"]
    A = len(glob["aux"])
    lazy_ct = all(ct[0] < (1 << 30) for ct in glob["ct"])
    lazy_aux = all(ax[0] < (1 << 30) for ax in glob["aux"])
    rq = []
    for i, ct in enumerate(glob["ct"]):
        rq.append(_inv_stages(tq_ref[:, i], itwq_ref, itwq_sh_ref,
                              u32(ct[0]), u32(ct[2]), u32(ct[3]),
                              n=n, bt=bt, tw_l=i, lazy=lazy_ct))
    rp = []
    for j, ax in enumerate(glob["aux"]):
        rp.append(_inv_stages(tp_ref[:, j], itwp_ref, itwp_sh_ref,
                              u32(ax[0]), u32(ax[2]), u32(ax[3]),
                              n=n, bt=bt, tw_l=j, lazy=lazy_aux))

    y0 = w32.shoup_mul32(rq[0], u32(inv0), u32(inv0_sh), u32(q0))
    y1 = w32.shoup_mul32(rq[1], u32(inv1), u32(inv1_sh), u32(q1))
    a = w.add64(w32.mul32_full(y0, u32(q1)), w32.mul32_full(y1, u32(q0)))
    qp = (u32(q_lo), u32(q_hi))
    half = (u32(h_lo), u32(h_hi))
    a = w.select64(w.ge64(a, qp), w.sub64(a, qp), a)
    neg_a = w.gt64(a, half)
    mag = w.select64(neg_a, w.sub64(qp, a), a)

    m_list = []
    for j, ax in enumerate(glob["aux"]):
        pj = u32(ax[0])
        red = w32.reduce_u64_shoup32(mag[0], mag[1], pj, u32(ax[4]),
                                     u32(ax[5]), u32(ax[6]))
        a_ext = jnp.where(neg_a, w32.mod_neg32(red, pj), red)
        diff = w32.mod_sub32(rp[j], a_ext, pj)
        m_list.append(w32.shoup_mul32(diff, u32(ax[7]), u32(ax[8]), pj))

    vs = []
    for j, ax in enumerate(glob["aux"]):
        pj = u32(ax[0])
        one_sh = u32(ax[6])
        x = m_list[j]
        for i in range(j):
            vi = w32.shoup_reduce32(vs[i], pj, one_sh)
            x = w32.mod_sub32(x, vi, pj)
            g, gsh = glob["garner"][j][i]
            x = w32.shoup_mul32(x, u32(g), u32(gsh), pj)
        vs.append(x)
    neg_m = jnp.zeros_like(vs[0], dtype=bool)
    for j, ax in enumerate(glob["aux"]):
        hj = u32(ax[9])
        neg_m = (vs[j] > hj) | ((vs[j] == hj) & neg_m)

    phi = tuple(u32(wd) for wd in glob["phi"])
    prod = w.mul64x128(mag, phi)
    w3 = prod[3] + u32(1 << 29)
    c3 = (w3 < prod[3]).astype(jnp.uint32)
    w4 = prod[4] + c3
    c4 = (w4 < prod[4]).astype(jnp.uint32)
    w5 = prod[5] + c4
    r = ((w3 >> 30) | (w4 << 2), (w4 >> 30) | (w5 << 2))

    for i, ct in enumerate(glob["ct"]):
        qs = u32(ct[0])
        one_sh = u32(ct[6])
        m_mod = w32.shoup_reduce32(vs[A - 1], qs, one_sh)
        for j in range(A - 2, -1, -1):
            vj = w32.shoup_reduce32(vs[j], qs, one_sh)
            pq, pqsh = glob["ctx"][i][j]
            m_mod = w32.mod_add32(
                w32.shoup_mul32(m_mod, u32(pq), u32(pqsh), qs), vj, qs)
        m_mod = jnp.where(neg_m,
                          w32.mod_sub32(m_mod, u32(ct[7]), qs), m_mod)
        pm = w32.shoup_mul32(m_mod, u32(ct[8]), u32(ct[9]), qs)
        r_mod = w32.reduce_u64_shoup32(r[0], r[1], qs, u32(ct[4]),
                                       u32(ct[5]), one_sh)
        r_signed = jnp.where(neg_a, w32.mod_neg32(r_mod, qs), r_mod)
        oi = w32.mod_add32(r_signed, pm, qs)
        if eval_out:
            oi = w32.shoup_mul32(oi, u32(ct[4]), u32(ct[5]), qs)  # x * R
            oi = _fwd_stages(oi, ftwq_ref, ftwq_sh_ref, qs, n=n, bt=bt,
                             tw_l=i, lazy=lazy_ct)
        out_ref[:, i] = oi


@lru_cache(maxsize=None)
def _hps_tables(ct_moduli: tuple, aux_moduli: tuple, p: int, n: int):
    """Bake every host constant of the narrow HPS glue into nested tuples
    (hashable, closed over by the kernel as immediates)."""
    from ..narrow import _narrow_hps_consts  # lazy: narrow imports ops lazily

    cst = _narrow_hps_consts(ct_moduli, aux_moduli, p)
    _, glob_items = _extend_tables(ct_moduli, ct_moduli, n)
    compose_g = dict(glob_items)
    compose = (compose_g["q0"], compose_g["q1"], compose_g["inv0"],
               compose_g["inv0_sh"], compose_g["inv1"], compose_g["inv1_sh"],
               compose_g["q_lo"], compose_g["q_hi"], compose_g["h_lo"],
               compose_g["h_hi"])
    phi = tuple((cst["phi"] >> (32 * i)) & 0xFFFFFFFF for i in range(4))

    def s_post(m):
        """(w, w_shoup) for the inverse-NTT final scalar, from-Montgomery
        fused: w = n^{-1} R^{-1} mod m (= the basis ninv_fuse)."""
        tabs = w32.build_psi_tables32(m, n)
        return int(tabs["ninv_fuse"]), int(tabs["ninv_fuse_shoup"])

    aux = []
    for j, pj in enumerate(aux_moduli):
        cc = w32.mont_consts32(pj)
        pw, pwsh = s_post(pj)
        aux.append((pj, cc["qinv_neg"], pw, pwsh, cc["r1"], cc["r1_shoup"],
                    cc["one_shoup"], cst["qinv_pj"][j], cst["qinv_pj_sh"][j],
                    cst["half_digits"][j]))
    garner = tuple(
        tuple((cst["garner_inv"][j][i], cst["garner_inv_sh"][j][i])
              for i in range(j))
        for j in range(len(aux_moduli)))
    ct = []
    ctx = []
    for i, m in enumerate(ct_moduli):
        cc = w32.mont_consts32(m)
        pw, pwsh = s_post(m)
        ct.append((m, cc["qinv_neg"], pw, pwsh, cc["r1"],
                   cc["r1_shoup"], cc["one_shoup"], cst["pmodq"][i],
                   cst["p_qi"][i], cst["p_qi_sh"][i]))
        ctx.append(tuple((cst["pj_qi"][i][j], cst["pj_qi_sh"][i][j])
                         for j in range(len(aux_moduli))))
    glob = {"compose": compose, "phi": phi, "aux": tuple(aux),
            "garner": garner, "ct": tuple(ct), "ctx": tuple(ctx)}
    return tuple(sorted(glob.items()))


@lru_cache(maxsize=None)
def _build_hps(n: int, bt: int, A: int, nb: int, glob_items: tuple,
               eval_out: bool, interpret: bool):
    R = n // _LANES
    logn = n.bit_length() - 1
    kfn = partial(_hps_kernel, n=n, bt=bt, glob=dict(glob_items),
                  eval_out=eval_out)
    vmem = pltpu.VMEM if pltpu is not None else None
    twq_spec = pl.BlockSpec((2, logn, R, _LANES), lambda b: (0, 0, 0, 0),
                            memory_space=vmem)
    twp_spec = pl.BlockSpec((A, logn, R, _LANES), lambda b: (0, 0, 0, 0),
                            memory_space=vmem)
    return pl.pallas_call(
        kfn,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, 2, R, _LANES), lambda b: (b, 0, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((bt, A, R, _LANES), lambda b: (b, 0, 0, 0),
                         memory_space=vmem),
            twq_spec,
            twq_spec,
            twp_spec,
            twp_spec,
            twq_spec,
            twq_spec,
        ],
        out_specs=pl.BlockSpec((bt, 2, R, _LANES), lambda b: (b, 0, 0, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((nb * bt, 2, R, _LANES), jnp.uint32),
        interpret=interpret,
        **_mosaic_params(),
    )


def _pick_bt_hps(B: int, n: int) -> int:
    """Divisor of B sized for the HPS kernel's ~24 live [bt, n] tiles."""
    cap = max(1, (_vmem_budget() * 6 // 4) // (n * 4 * 24))
    ov = _bt_override(B, cap)
    if ov is not None:
        return ov
    bt = min(B, cap)
    while B % bt:
        bt -= 1
    return bt


def _pick_bt_relin(B: int, n: int) -> int:
    """Tile size for the relin kernel — ~12 live [bt, n] tiles, with a 4x
    larger budget than _pick_bt.  The kernel's sequential digit loop (D
    dependent NTT+dot rounds per tile) leaves the VPU ILP-starved at small
    tiles; measured on v5e, bt 32 -> 128 cut the relin phase ~40%+ (the
    grid runs SEQUENTIALLY on the one TensorCore, so fewer/bigger programs
    are strictly less overhead while VMEM fits — Mosaic's scoped limit is
    raised accordingly in _mosaic_params)."""
    cap = max(1, (6 * _vmem_budget()) // (n * 4 * 12))
    ov = _bt_override(B, cap)
    if ov is not None:
        return ov
    bt = min(B, cap)
    while B % bt:
        bt -= 1
    return bt


def hps_ntt_fused(t_q, t_p, ct_moduli, aux_moduli, p: int, *,
                  eval_out=True, interpret=False, tables=None):
    """Fused HPS scale: INTT(both bases) + glue + output forward NTT.

    t_q: eval-Montgomery u32 [..., 2, n]; t_p: [..., A, n].  Returns
    round(p*t/Q) mod q_i as eval-Montgomery [..., 2, n] (eval_out) or
    standard coefficient residues (for the c2 component).  `tables` =
    (ct_fwd, ct_fwd_sh, ct_inv, ct_inv_sh, aux_inv, aux_inv_sh) device
    arrays ([2|A, logn, n])."""
    ct_moduli, aux_moduli = tuple(ct_moduli), tuple(aux_moduli)
    n = t_q.shape[-1]
    batch = t_q.shape[:-2]
    B = 1
    for s in batch:
        B *= s
    A = len(aux_moduli)
    logn = n.bit_length() - 1
    R = n // _LANES
    glob_items = _hps_tables(ct_moduli, aux_moduli, p, n)
    if tables is not None:
        ftwq, ftwq_sh, itwq, itwq_sh, itwp, itwp_sh = (
            t.reshape(-1, logn, R, _LANES) for t in tables)
    else:
        ftwq, ftwq_sh, itwq, itwq_sh, _ = _stage_tables(ct_moduli, n)
        _, _, itwp, itwp_sh, _ = _stage_tables(aux_moduli, n)
        ftwq, ftwq_sh, itwq, itwq_sh, itwp, itwp_sh = (
            jnp.asarray(t) for t in
            (ftwq, ftwq_sh, itwq, itwq_sh, itwp, itwp_sh))
    bt = _pick_bt_hps(B, n)
    call = _build_hps(n, bt, A, B // bt, glob_items, eval_out, interpret)
    out = call(t_q.reshape(B, 2, R, _LANES), t_p.reshape(B, A, R, _LANES),
               itwq, itwq_sh, itwp, itwp_sh, ftwq, ftwq_sh)
    return out.reshape(*batch, 2, n)


def relin_dot_fused(res, rlk0, rlk1, ct_moduli, gadget_base: int,
                    gadget_digits: int, *, interpret=False, tables=None):
    """Whole gadget-keyswitch inner product fused into one kernel.

    res: c2's standard-form coefficient residues u32 [..., L, n] (L=2 ct
    primes); rlk0/rlk1: [D, L, n] NTT-Montgomery key ladders.  Returns
    (acc0, acc1) [..., L, n] NTT-Montgomery — equal to the narrow engine's
    `_gadget_digits32` + per-digit NTT + Montgomery dot + digit sum."""
    ct_moduli = tuple(ct_moduli)
    n = res.shape[-1]
    batch = res.shape[:-2]
    B = 1
    for s in batch:
        B *= s
    L = len(ct_moduli)
    logn = n.bit_length() - 1
    log_b = gadget_base.bit_length() - 1
    consts_np, glob_items = _extend_tables(ct_moduli, ct_moduli, n)
    R = n // _LANES
    if tables is not None:
        fwd_tw = tables[0].reshape(L, logn, R, _LANES)
        fwd_sh = tables[1].reshape(L, logn, R, _LANES)
    else:
        fwd_tw, fwd_sh, _, _, _ = _stage_tables(ct_moduli, n)
        fwd_tw, fwd_sh = jnp.asarray(fwd_tw), jnp.asarray(fwd_sh)
    bt = _pick_bt_relin(B, n)
    call = _build_relin(n, bt, L, B // bt, gadget_digits, log_b, glob_items,
                        interpret)
    a0, a1 = call(jnp.asarray(consts_np), res.reshape(B, L, R, _LANES),
                  rlk0.reshape(gadget_digits, L, R, _LANES),
                  rlk1.reshape(gadget_digits, L, R, _LANES),
                  fwd_tw, fwd_sh)
    return (a0.reshape(*batch, L, n), a1.reshape(*batch, L, n))


def extend_ntt_fused(res, ct_moduli, aux_moduli, *, interpret=False,
                     tables=None):
    """Centered base extension Q -> P fused with the aux forward NTT.

    res: standard-form coefficient residues u32 [..., 2, n] over the two
    ct primes.  Returns NTT-Montgomery aux polys [..., A, n] — exactly
    `from_coeff_residues32(aux_basis, centered_reduce(compose(res)))` in one
    kernel (the narrow engine's `_extend_to_aux`, minus every intermediate
    HBM round trip).  `tables` = aux (stw_fwd, stw_fwd_sh) [A, logn, n]."""
    ct_moduli, aux_moduli = tuple(ct_moduli), tuple(aux_moduli)
    n = res.shape[-1]
    batch = res.shape[:-2]
    B = 1
    for s in batch:
        B *= s
    A = len(aux_moduli)
    logn = n.bit_length() - 1
    consts_np, glob_items = _extend_tables(ct_moduli, aux_moduli, n)
    R = n // _LANES
    if tables is not None:
        fwd_tw = tables[0].reshape(A, logn, R, _LANES)
        fwd_sh = tables[1].reshape(A, logn, R, _LANES)
    else:
        fwd_tw, fwd_sh, _, _, _ = _stage_tables(aux_moduli, n)
        fwd_tw, fwd_sh = jnp.asarray(fwd_tw), jnp.asarray(fwd_sh)
    bt = _pick_bt(B, n)
    call = _build_extend(n, bt, A, B // bt, glob_items, interpret)
    out = call(jnp.asarray(consts_np), res.reshape(B, 2, R, _LANES),
               fwd_tw, fwd_sh)
    return out.reshape(*batch, A, n)


def ntt_fwd32_fused(x, moduli, *, to_mont=False, interpret=False,
                    tables=None):
    """Forward negacyclic NTT, fused; optionally fold to-Montgomery in.
    `tables` = (stw_fwd, stw_fwd_sh) device arrays [L, logn, n]."""
    return _run("fwd", x, tuple(moduli),
                "to_mont" if to_mont else "identity", "identity", interpret,
                tables)


def ntt_inv32_fused(x, moduli, *, from_mont=False, interpret=False,
                    tables=None):
    """Inverse negacyclic NTT, fused; optionally fold from-Montgomery in.
    `tables` = (stw_inv, stw_inv_sh) device arrays [L, logn, n]."""
    return _run("inv", x, tuple(moduli), "identity",
                "ninv_fuse" if from_mont else "ninv_mont", interpret,
                tables)
