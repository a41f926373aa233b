"""Prototype: MXU four-step NTT (n = 64 x 64) with int8-plane matmuls.

Measures whether putting the NTT butterfly FLOPs on the MXU (systolic
int8 matmul, i32 accumulation) beats the VMEM-resident VPU butterfly
kernels (ops/ntt_pallas32.py).  The four-step decomposition:

  x (natural order) viewed as A[j1][j2], j = 64*j1 + j2
  Y = M1 @ A        M1[r][j1] = psi^(64 j1) * w^(64 j1 brv6(r))   (column NTT)
  Z = Y * T         T[r][j2]  = psi^(j2)    * w^(j2 brv6(r))      (twiddle)
  V = Z @ M2^T      M2[c][j2] = w^(64 j2 brv6(c))                 (row NTT)
  out = V flattened row-major  ==  ntt_fwd32's bit-reversed output

Exact integer matmuls over Z_q (q < 2^30) via balanced base-256 planes:
x = sum_a x_a 2^(8a), M = sum_m M_m 2^(8m), x_a/M_m in [-128, 128), so each
int8 MXU product plane P_am = M_m @ x_a has |P| <= 64*128*128 = 2^20 in i32.
Recombination: C_s = sum_{a+m=s} P_am (|C_s| < 2^22), then one u64-pair
dot with 2^(8s) mod q and a single Shoup reduction per element (signs
handled by a constant offset folded into the final subtract).

Usage: python tools/proto_mxu_ntt.py [--batch 2048]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N1 = 64
N2 = 64
N = N1 * N2


def brv(x, bits):
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def build_matrices(q: int):
    """Host: M1, T, M2 (standard form u32) for the fwd four-step."""
    from exacto_tpu.ring import hostmath as hm

    psi = int(hm.psi_2n(q, N))
    w = psi * psi % q
    r6 = [brv(r, 6) for r in range(N1)]
    M1 = np.zeros((N1, N1), dtype=np.uint32)
    for r in range(N1):
        M1[r] = [(pow(psi, 64 * j, q) * pow(w, 64 * j * r6[r], q)) % q
                 for j in range(N1)]
    T = np.zeros((N1, N2), dtype=np.uint32)
    for r in range(N1):
        T[r] = [(pow(psi, j, q) * pow(w, j * r6[r], q)) % q
                for j in range(N2)]
    M2 = np.zeros((N2, N2), dtype=np.uint32)
    for c in range(N2):
        M2[c] = [pow(w, 64 * j * brv(c, 6), q) % q for j in range(N2)]
    return M1, T, M2


def planes_host(M: np.ndarray) -> np.ndarray:
    """u32 [r, c] -> int8 planes [4, r, c], balanced base-256."""
    out = np.zeros((4,) + M.shape, dtype=np.int8)
    v = M.astype(np.int64)
    for a in range(4):
        p = v & 0xFF
        ge = p >= 128
        out[a] = (p - (ge << 8)).astype(np.int8)
        v = (v >> 8) + ge
    assert (v == 0).all()
    return out


def make_fourstep(q: int, interpret=False):
    import jax
    import jax.numpy as jnp

    from exacto_tpu.ring import wordops32 as w32

    M1, T, M2 = build_matrices(q)
    M1p = jnp.asarray(planes_host(M1))          # [4, r, j1] int8
    M2p = jnp.asarray(planes_host(M2))          # [4, c, j2] int8
    Tw = jnp.asarray(T)
    Tw_sh = jnp.asarray(((T.astype(np.uint64) << 32) // q).astype(np.uint32))
    qq = jnp.uint32(q)
    cc = w32.mont_consts32(q)
    one_sh = jnp.uint32(cc["one_shoup"])
    # recombination constants: 2^(8s) mod q for s = 0..6, and the offset
    # K = sum_s 2^22 * (2^(8s) mod q) mod q folded into one subtract
    cs = np.array([pow(2, 8 * s, q) for s in range(7)], dtype=np.uint32)
    K = int(sum((1 << 22) * int(c) for c in cs) % q)
    cs_j = jnp.asarray(cs)
    K_j = jnp.uint32(K)
    r1 = jnp.uint32(cc["r1"])
    r1_sh = jnp.uint32(cc["r1_shoup"])

    def decompose(x):
        """u32 [..., n] -> int8 [..., n, 4] balanced planes."""
        ps = []
        carry = jnp.zeros_like(x)
        for a in range(4):
            p = ((x >> (8 * a)) & jnp.uint32(0xFF)) + carry
            ge = p >= 128
            ps.append((p.astype(jnp.int32) - (ge.astype(jnp.int32) << 8))
                      .astype(jnp.int8))
            carry = ge.astype(jnp.uint32)
        return jnp.stack(ps, axis=-1)

    def recombine(P):
        """i32 [..., 4a, 4m] -> u32 [...] congruent mod q (value < 2q)."""
        # C_s = sum_{a+m=s} P; offset by 2^22 so everything is nonnegative
        C = [jnp.zeros(P.shape[:-2], jnp.int32) for _ in range(7)]
        for a in range(4):
            for m in range(4):
                C[a + m] = C[a + m] + P[..., a, m]
        lo = jnp.zeros(P.shape[:-2], jnp.uint32)
        hi = jnp.zeros(P.shape[:-2], jnp.uint32)
        for s in range(7):
            u = (C[s] + (1 << 22)).astype(jnp.uint32)
            plo, phi = w32.mul32_full(u, cs_j[s])
            nlo = lo + plo
            hi = hi + phi + (nlo < lo).astype(jnp.uint32)
            lo = nlo
        red = w32.reduce_u64_shoup32(lo, hi, qq, r1, r1_sh, one_sh)
        return w32.mod_sub32(red, K_j, qq)

    def fourstep(x):
        """x: u32 [B, n] standard form -> fwd NTT (bit-reversed), standard."""
        B = x.shape[0]
        A = x.reshape(B, N1, N2)
        Ap = decompose(A)                            # [B, j1, j2, 4a] int8
        # column NTT: P[B, r, j2, a, m] = sum_j1 M1p[m, r, j1] Ap[B, j1, j2, a]
        P = jnp.einsum("mrj,bjka->brkam", M1p, Ap,
                       preferred_element_type=jnp.int32)
        Y = recombine(P)                             # [B, r, j2] u32 < 2q
        Y = jnp.where(Y >= qq, Y - qq, Y)
        Z = w32.shoup_mul32(Y, Tw[None], Tw_sh[None], qq)
        Zp = decompose(Z)                            # [B, r, j2, 4a]
        P2 = jnp.einsum("mcj,brja->brcam", M2p, Zp,
                        preferred_element_type=jnp.int32)
        V = recombine(P2)
        V = jnp.where(V >= qq, V - qq, V)
        return V.reshape(B, N)

    return fourstep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp

    from exacto_tpu.ring import wordops32 as w32
    from exacto_tpu import narrow as nr
    from exacto_tpu.ops import ntt_pallas32 as npal

    q = nr.find_narrow_primes(N, 1, 30)[0]
    print(f"q = {q} ({q.bit_length()} bits), n = {N}, batch = {B}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, q, (B, N), dtype=np.uint64)
                    .astype(np.uint32))

    fourstep = jax.jit(make_fourstep(q))

    # reference: standard-form in -> to_mont -> fused Pallas NTT -> from_mont
    cc = w32.mont_consts32(q)

    def ref_fwd(x):
        xm = w32.to_mont32(x[:, None, :], jnp.uint32(q),
                           jnp.uint32(cc["qinv_neg"]), jnp.uint32(cc["r2"]))
        y = npal.ntt_fwd32_fused(xm, (q,))
        return w32.from_mont32(y, jnp.uint32(q),
                               jnp.uint32(cc["qinv_neg"]))[:, 0, :]

    ref_fwd_j = jax.jit(ref_fwd)

    got = np.asarray(jax.block_until_ready(fourstep(x)))
    want = np.asarray(jax.block_until_ready(ref_fwd_j(x)))
    exact = np.array_equal(got, want)
    print("bit-exact vs fused Pallas NTT:", exact)
    if not exact:
        bad = np.nonzero(got != want)
        print("first mismatches:", bad[0][:4], bad[1][:4],
              got[bad][:4], want[bad][:4])

    # pallas-only timing (to_mont/from_mont stripped) for a fair kernel race
    def pal_only(x):
        return npal.ntt_fwd32_fused(x[:, None, :], (q,))[:, 0, :]

    pal_j = jax.jit(pal_only)

    def bench(fn, tag):
        out = jax.block_until_ready(fn(x))
        t0 = time.perf_counter()
        outs = [fn(x) for _ in range(args.iters)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{tag}: {dt * 1e3:.3f} ms  "
              f"({B / dt:.0f} transforms/s)")
        return dt

    t_mxu = bench(fourstep, "mxu four-step (jnp einsum)")
    t_pal = bench(pal_j, "pallas VPU butterflies    ")
    print(f"ratio mxu/pallas = {t_mxu / t_pal:.2f}x")


if __name__ == "__main__":
    main()
