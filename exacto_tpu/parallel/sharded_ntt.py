"""Ring-dimension-sharded NTT: butterfly stages with ppermute exchanges.

SURVEY §2's last TPU-equivalent row (sharded NTT via ICI collectives,
pattern source SNIPPETS.md 2-3) as an explicit shard_map program: the ring
axis n is split over a mesh axis, the first log2(n_devices) forward stages
(largest butterfly strides) exchange whole local blocks with the XOR
partner device over `jax.lax.ppermute`, and the remaining stages run
device-locally with the same per-stage twiddle-vector formulation as the
fused kernels (ops/ntt_pallas.py `_stage_tables`).

Why this shape: a radix-2 stage at stride t pairs j with j ^ t.  With n
split into contiguous blocks of n_loc = n/n_dev per device, strides
t >= n_loc pair element j of device i with element j of device i ^
(t/n_loc) — a single full-block exchange per stage, the cheapest possible
communication pattern (log2(n_dev) ppermutes total, each n_loc elements),
riding ICI on real hardware.  Twiddle vectors are sharded exactly like the
data, so no cross-device twiddle indexing exists.

Bit-exact against ring.wordops32.ntt_fwd32/ntt_inv32 (same Montgomery
butterfly math, same ordering); equivalence-tested on the 8-device CPU
mesh (tests/test_parallel.py::test_sharded_ntt_*).  This is the
correctness prototype of the pattern — the production path keeps NTTs
device-local (limb/batch sharding) because one n=4096 transform fits VMEM;
ring sharding matters for n >> 2^16 single transforms.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ring import hostmath as hm
from ..ring import wordops32 as w32


@lru_cache(maxsize=None)
def _stage_tables32(moduli: tuple, n: int):
    """Per-stage full Montgomery twiddle vectors [logn, L, n] (fwd + inv)
    and the n^{-1} Montgomery constants, u32."""
    logn = n.bit_length() - 1
    L = len(moduli)
    j = np.arange(n)
    fwd = np.zeros((logn, L, n), dtype=np.uint32)
    inv = np.zeros((logn, L, n), dtype=np.uint32)
    ninv = np.zeros(L, dtype=np.uint32)
    for li, q in enumerate(moduli):
        psi = hm.psi_2n(q, n)
        ipsi = hm.mod_inv(psi, q)
        R = 1 << 32
        psi_rev = np.zeros(n, dtype=np.uint64)
        ipsi_rev = np.zeros(n, dtype=np.uint64)
        for i in range(n):
            e = hm.bit_reverse(i, logn)
            psi_rev[i] = pow(psi, e, q) * R % q
            ipsi_rev[i] = pow(ipsi, e, q) * R % q
        for s in range(logn):
            fwd[s, li] = psi_rev[(1 << s) + (j >> (logn - s))]
            inv[s, li] = ipsi_rev[(n >> (s + 1)) + (j >> (s + 1))]
        ninv[li] = hm.mod_inv(n, q) * R % q
    return fwd, inv, ninv


def _butterfly_ct(u, v, tw, q, qi):
    wv = w32.mont_mul32(v, tw, q, qi)
    return w32.mod_add32(u, wv, q), w32.mod_sub32(u, wv, q)


def _butterfly_gs(u, v, tw, q, qi):
    top = w32.mod_add32(u, v, q)
    bot = w32.mont_mul32(w32.mod_sub32(u, v, q), tw, q, qi)
    return top, bot


def _local_stage(x, tw, t, q, qi, gs):
    """One device-local radix-2 stage at stride t on [..., L, n_loc]."""
    n_loc = x.shape[-1]
    batch = x.shape[:-1]
    xr = x.reshape(*batch, n_loc // (2 * t), 2, t)
    u, v = xr[..., 0, :], xr[..., 1, :]
    twr = tw.reshape(*tw.shape[:-1], n_loc // (2 * t), 2, t)
    tws = twr[..., 1, :]  # twiddle vector entries at the v positions
    # butterfly operands are [..., L, nb, t]: the modulus vector needs an
    # extra broadcast axis vs the [..., L, n] layout
    q3, qi3 = q[..., None], qi[..., None]
    if gs:
        top, bot = _butterfly_gs(u, v, tws, q3, qi3)
    else:
        top, bot = _butterfly_ct(u, v, tws, q3, qi3)
    return jnp.stack([top, bot], axis=-2).reshape(*batch, n_loc)


def _exchange_stage(x, tw, rt, q, qi, axis, n_dev, gs):
    """Cross-device stage: stride t = rt * n_loc; exchange full local
    blocks with the XOR-partner device, keep this device's output half."""
    perm = [(i, i ^ rt) for i in range(n_dev)]
    other = jax.lax.ppermute(x, axis, perm)
    low = (jax.lax.axis_index(axis) & rt) == 0
    u = jnp.where(low, x, other)
    v = jnp.where(low, other, x)
    if gs:
        top, bot = _butterfly_gs(u, v, tw, q, qi)
    else:
        top, bot = _butterfly_ct(u, v, tw, q, qi)
    return jnp.where(low, top, bot)


def _run(x, moduli, mesh, axis, inverse):
    n = x.shape[-1]
    logn = n.bit_length() - 1
    n_dev = mesh.shape[axis]
    n_loc = n // n_dev
    if n_loc < 2 or n_loc * n_dev != n:
        raise ValueError("ring axis must split n into blocks of >= 2")
    fwd_np, inv_np, ninv_np = _stage_tables32(tuple(moduli), n)
    tw_all = jnp.asarray(inv_np if inverse else fwd_np)
    q = jnp.asarray(np.array(moduli, dtype=np.uint32)).reshape(-1, 1)
    qi = jnp.asarray(np.array(
        [w32.mont_consts32(m)["qinv_neg"] for m in moduli],
        dtype=np.uint32)).reshape(-1, 1)
    ninv = jnp.asarray(ninv_np).reshape(-1, 1)
    ndim = x.ndim
    xspec = P(*([None] * (ndim - 1)), axis)
    twspec = P(None, None, axis)

    def body(xs, tws):
        y = xs
        for s in range(logn):
            t = (1 << s) if inverse else (n >> (s + 1))
            tw = tws[s]
            if t >= n_loc:
                y = _exchange_stage(y, tw, t // n_loc, q, qi, axis, n_dev,
                                    gs=inverse)
            else:
                y = _local_stage(y, tw, t, q, qi, gs=inverse)
        if inverse:
            y = w32.mont_mul32(y, ninv, q, qi)
        return y

    fn = jax.shard_map(body, mesh=mesh, in_specs=(xspec, twspec),
                       out_specs=xspec, check_vma=False)
    return fn(x, tw_all)


def ntt_fwd32_sharded(x, moduli, mesh, axis: str = "ring"):
    """Forward narrow NTT on [..., L, n] u32 Montgomery with the ring axis
    sharded on mesh[`axis`]; bit-exact vs w32.ntt_fwd32."""
    return _run(x, moduli, mesh, axis, inverse=False)


def ntt_inv32_sharded(x, moduli, mesh, axis: str = "ring"):
    """Inverse narrow NTT (Montgomery in/out, n^{-1} folded)."""
    return _run(x, moduli, mesh, axis, inverse=True)


def ring_sharding(mesh, ndim: int, axis: str = "ring"):
    return NamedSharding(mesh, P(*([None] * (ndim - 1)), axis))
