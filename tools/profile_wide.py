"""Phase-level timing of the WIDE (u32-pair) dBFV multiply on the live
backend — the per-phase breakdown VERDICT r3 weak #5 asked for before the
wide engine's retirement as parity-only surface is final.

The wide engine runs the reference's own moduli (40-60-bit primes as u32
pairs, `params.presets.u64_dbfv`); ROADMAP argued its ~12x gap vs narrow
from butterfly op-counts alone (~2x predicted).  This script times each
phase of `dbfv.dbfv_mul` (d^2 fan-out of `_bfv_mul_hps`) so the other ~6x
is attributed, not guessed: NTT sweeps vs HPS glue vs relinearization.

Usage: python tools/profile_wide.py [--batch 64] [--md]
  --md appends a markdown section to reports/wide_phase_table.md
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, *args, iters=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters, outs[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--md", action="store_true")
    args = ap.parse_args()
    B = args.batch

    import jax

    from exacto_tpu import config as cfg

    cfg.enable_persistent_cache()

    from exacto_tpu.bfv import eval as be
    from exacto_tpu.bfv import gen_relin_key, gen_secret_key
    from exacto_tpu.bfv.keyswitch import relinearize
    from exacto_tpu.dbfv import dbfv_encrypt_sk, dbfv_decrypt, dbfv_mul
    from exacto_tpu.params.presets import u64_dbfv
    from exacto_tpu.ring import rns as rr

    params = u64_dbfv()
    bp = params.bfv_params
    d = params.num_digits
    sk = jax.jit(lambda k: gen_secret_key(k, bp))(jax.random.PRNGKey(1))
    rlk = jax.jit(lambda k: gen_relin_key(k, sk))(jax.random.PRNGKey(2))
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 63, size=B, dtype=np.uint64) * 2 + 1
    b = rng.integers(0, 1 << 63, size=B, dtype=np.uint64) * 2 + 1
    ct1 = dbfv_encrypt_sk(jax.random.PRNGKey(3), a, sk, params)
    ct2 = dbfv_encrypt_sk(jax.random.PRNGKey(4), b, sk, params)

    n = bp.ring_degree
    L = len(bp.moduli)
    A = len(bp.aux_moduli)
    print(f"wide engine: batch={B} d={d} n={n} L={L} A={A} "
          f"gadget_digits={bp.gadget_digits}")

    rows = []

    def add(name, t, note=""):
        rows.append((name, t, note))
        print(f"{name:<24} {t*1e3:9.2f} ms  {note}")

    mul = jax.jit(lambda x, y, r: dbfv_mul(x, y, r))
    t_full, out = bench(mul, ct1, ct2, rlk, iters=args.iters)
    add("full dbfv_mul", t_full, f"({B/t_full:.1f} ops/s)")
    got = np.asarray(dbfv_decrypt(out, sk), dtype=np.uint64)
    ok = bool(np.array_equal(got, a * b))
    print(f"parity: {ok}")

    # phase 1: centered base extension x4 (per dbfv_mul: on each of the
    # two components of both operands, across the d-limb axis)
    ext = jax.jit(lambda c: [be._base_extend_centered(bp, c.limbs.c[0]),
                             be._base_extend_centered(bp, c.limbs.c[1])])
    t, (e10, e11) = bench(ext, ct1, iters=args.iters)
    add("base_extend x2", t, "(runs x2 per multiply = x4 of these halves)")
    _, (e20, e21) = bench(ext, ct2, iters=args.iters)

    # phase 2: dual-basis tensor products (the d^2 digit conv collapses to
    # limb-axis convolution; here timed as the three Karatsuba tensors the
    # wide path actually runs inside dbfv_mul)
    def tensor(c10, c11, c20, c21, f10, f11, f20, f21):
        ctb, auxb = bp.ct_basis, bp.aux_basis
        t0q = rr.rp_mul(ctb, c10, c20)
        t2q = rr.rp_mul(ctb, c11, c21)
        tmq = rr.rp_mul(ctb, rr.rp_add(ctb, c10, c11),
                        rr.rp_add(ctb, c20, c21))
        t1q = rr.rp_sub(ctb, rr.rp_sub(ctb, tmq, t0q), t2q)
        t0p = rr.rp_mul(auxb, f10, f20)
        t2p = rr.rp_mul(auxb, f11, f21)
        tmp = rr.rp_mul(auxb, rr.rp_add(auxb, f10, f11),
                        rr.rp_add(auxb, f20, f21))
        t1p = rr.rp_sub(auxb, rr.rp_sub(auxb, tmp, t0p), t2p)
        return (t0q, t1q, t2q), (t0p, t1p, t2p)

    tens = jax.jit(tensor)
    t, (tq, tp) = bench(tens, ct1.limbs.c[0], ct1.limbs.c[1],
                        ct2.limbs.c[0], ct2.limbs.c[1],
                        e10, e11, e20, e21, iters=args.iters)
    add("tensor products", t, "(both bases, 3 Karatsuba tensors)")

    # phase 3: HPS scale x3
    hps = jax.jit(lambda x, y: be._hps_scale(bp, x, y))
    t, r0 = bench(hps, tq[0], tp[0], iters=args.iters)
    add("hps_scale (x1 of 3)", t)
    _, r1 = bench(hps, tq[1], tp[1], iters=args.iters)
    _, r2 = bench(hps, tq[2], tp[2], iters=args.iters)

    # phase 4: relinearize (gadget decompose + keyswitch dot), per limb-axis
    from exacto_tpu.bfv import BfvCiphertext

    rel = jax.jit(lambda x0, x1, x2, r: relinearize(
        BfvCiphertext(c=(x0, x1, x2), params=bp), r))
    t, _ = bench(rel, r0, r1, r2, rlk, iters=args.iters)
    add("relinearize", t)

    # micro: one round trip through the coefficient domain at the
    # multiply's shape (pair-lane INTT + forward NTT)
    x = ct1.limbs.c[0]
    rt = jax.jit(lambda v: rr.from_coeff_residues(
        bp.ct_basis, rr.to_coeff_residues(bp.ct_basis, v)))
    try:
        t, _ = bench(rt, x, iters=args.iters)
        add("NTT round trip ct", t, f"(INTT+NTT, [B,{d},{L},{n}] pair lanes)")
    except Exception as exc:  # noqa: BLE001
        print(f"NTT micro skipped: {str(exc)[:80]}")

    phase_sum = sum(tt for name, tt, _ in rows
                    if name not in ("full dbfv_mul",))
    print(f"\nphase sum (x multiplicity NOT applied): {phase_sum*1e3:.2f} ms "
          f"vs full {t_full*1e3:.2f} ms")

    if args.md:
        os.makedirs("reports", exist_ok=True)
        lines = [
            "# Wide-engine phase table (close-out evidence)",
            "",
            "Per-phase timings of the wide (u32-pair, reference-moduli)",
            "dBFV multiply at batch %d, n=%d, d=%d — the attribution of the"
            % (B, n, d),
            "wide-vs-narrow gap that retires the wide engine as the",
            "parity-only surface (ROADMAP; VERDICT r3 weak #5).",
            "",
            "| phase | measured ms | note |",
            "|---|---|---|",
        ]
        for name, tt, note in rows:
            lines.append("| %s | %.2f | %s |" % (name, tt * 1e3, note))
        lines += [
            "| parity | %s |  |" % ("PASS" if ok else "FAIL"),
            "",
        ]
        with open("reports/wide_phase_table.md", "w") as f:
            f.write("\n".join(lines) + "\n")
        print("wrote reports/wide_phase_table.md")


if __name__ == "__main__":
    main()
