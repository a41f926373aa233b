"""Production-scale narrow-native dBFV bootstrap timing (n=4096, d=8).

Closes the round-1 verdict item: "an n=4096, d=8 mul -> bootstrap -> mul
chain that decrypts correctly, with its time reported in bench or
paper_repro".  Reference being replaced: dbfv_mul_then_bootstrap /
dbfv_mul_chain_then_bootstrap, /root/reference/src/bootstrap/bfv_host.rs:
242-288 (the reference only ever *tests* bootstrap at n=16; this runs the
same pipeline structure at production ring degree on the TPU).

Profile: d=8 digits in base b=2 (p=256), t_orig=32, sparse secret
(hamming weight h), modswitch to q' = 2^e_lo, rounding polynomial of
degree ~ q'(h+1) evaluated by Paterson-Stockmeyer over a Q_boot sized by
the noise model in `narrow_boot.auto_boot_sizes`.

Writes reports/bootstrap_n{n}.md and prints one JSON line per phase plus
a summary line.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--e-lo", type=int, default=10)
    ap.add_argument("--hamming", type=int, default=8)
    ap.add_argument("--no-report", action="store_true")
    args = ap.parse_args()

    import jax

    from exacto_tpu import narrow as nr
    from exacto_tpu import narrow_boot as nb

    n = args.n
    t0 = time.time()
    phases = {}

    def stamp(name, t_start):
        dt = time.time() - t_start
        phases[name] = dt
        print(json.dumps({"phase": name, "s": round(dt, 2)}), flush=True)
        return time.time()

    qs = nr.find_narrow_primes(n, 2, 30)
    ps = nr.find_narrow_primes(n, 3, 30, skip=qs)
    bfv = nr.NarrowParams.create(n, 32, qs, ps, gadget_base=1 << 21)
    orig = nr.NarrowDbfvParams(base=2, num_digits=8, plain_modulus=256,
                               bfv=bfv)
    l_extra, a_boot = nb.auto_boot_sizes(orig, args.e_lo, args.hamming)
    bparams = nb.make_boot_params(orig, e_lo=args.e_lo,
                                  hamming=args.hamming,
                                  l_extra=l_extra, a_boot=a_boot)
    zmin, zmax = bparams.z_bounds
    degree = zmax - zmin
    print(json.dumps({
        "n": n, "d": 8, "base": 2, "p": 256, "t_orig": 32,
        "qprime": 1 << args.e_lo, "hamming": args.hamming,
        "t_boot": bparams.boot.plain_modulus,
        "l_boot": len(bparams.boot.moduli), "a_boot": len(bparams.boot.aux_moduli),
        "poly_degree": degree}), flush=True)

    t = time.time()
    sk = nr.gen_secret_key(jax.random.PRNGKey(1), bfv,
                           hamming_weight=args.hamming)
    rlk = nr.gen_relin_key(jax.random.PRNGKey(2), sk)
    bk, sk_boot = nb.gen_boot_key(jax.random.PRNGKey(3), sk, bparams)
    jax.block_until_ready(bk.rlk.rlk0)
    t = stamp("keygen_s", t)

    a = np.array([5, 200], dtype=np.uint64)
    b = np.array([7, 3], dtype=np.uint64)
    c = np.array([11, 2], dtype=np.uint64)
    ct_a = nr.dbfv_encrypt_sk(jax.random.PRNGKey(5), a, sk, orig)
    ct_b = nr.dbfv_encrypt_sk(jax.random.PRNGKey(6), b, sk, orig)
    ct_c = nr.dbfv_encrypt_sk(jax.random.PRNGKey(7), c, sk, orig)
    jax.block_until_ready(ct_a.limbs.c0)
    t = stamp("encrypt_s", t)

    prod = nr.dbfv_mul(ct_a, ct_b, rlk)
    jax.block_until_ready(prod.limbs.c0)
    t = stamp("mul1_s", t)
    got1 = np.asarray(nr.dbfv_decrypt(prod, sk), dtype=np.uint64)
    ok1 = bool(np.array_equal(got1, (a * b) % 256))
    t = stamp("decrypt_check1_s", t)

    # cold bootstrap (includes the jit compiles of the boot mul etc.)
    fresh = nb.dbfv_bootstrap(prod, bk)
    jax.block_until_ready(fresh.limbs.c0)
    t = stamp("bootstrap_cold_s", t)

    got2 = np.asarray(nr.dbfv_decrypt(fresh, sk), dtype=np.uint64)
    ok2 = bool(np.array_equal(got2, (a * b) % 256))
    t = stamp("decrypt_check2_s", t)

    # warm bootstrap (compile cache hot) — the steady-state number
    fresh2 = nb.dbfv_bootstrap(prod, bk)
    jax.block_until_ready(fresh2.limbs.c0)
    t = stamp("bootstrap_warm_s", t)

    prod2 = nr.dbfv_mul(fresh, ct_c, rlk)
    got3 = np.asarray(nr.dbfv_decrypt(prod2, sk), dtype=np.uint64)
    ok3 = bool(np.array_equal(got3, (a * b * c) % 256))
    t = stamp("mul2_decrypt_s", t)

    summary = {
        "metric": "dBFV mul->bootstrap->mul chain (n=%d, d=8)" % n,
        "bootstrap_warm_s": round(phases["bootstrap_warm_s"], 2),
        "bootstrap_cold_s": round(phases["bootstrap_cold_s"], 2),
        "mul1_ok": ok1, "post_bootstrap_ok": ok2, "chain_ok": ok3,
        "total_s": round(time.time() - t0, 1),
    }
    print(json.dumps(summary), flush=True)

    if not args.no_report:
        lines = [
            "# Narrow-native dBFV bootstrap at production ring degree",
            "",
            "Pipeline (narrow_boot.py): device modswitch Q->2^%d, phase"
            % args.e_lo,
            "re-encryption under Q_boot (%d primes), log2(n)=%d-step trace,"
            % (len(bparams.boot.moduli), int(np.log2(n))),
            "degree-%d rounding polynomial via Paterson-Stockmeyer, modswitch"
            % degree,
            "chain back down.  Reference architecture: bfv_host.rs:134-236"
            " (tested there only at n=16).",
            "",
            "| item | value |",
            "|---|---|",
            "| ring degree n | %d |" % n,
            "| digits d / base b / p | 8 / 2 / 256 |",
            "| t_orig / q' / t_boot | 32 / %d / %d |"
            % (1 << args.e_lo, bparams.boot.plain_modulus),
            "| secret hamming weight | %d |" % args.hamming,
            "| Q_boot primes (30-bit) | %d |" % len(bparams.boot.moduli),
            "| P-S polynomial degree | %d |" % degree,
        ] + ["| %s | %.2f s |" % (k, v) for k, v in phases.items()] + [
            "| mul -> bootstrap -> mul decrypts | %s |"
            % ("PASS" if (ok1 and ok2 and ok3) else "FAIL"),
            "",
        ]
        with open("reports/bootstrap_n%d.md" % n, "w") as f:
            f.write("\n".join(lines))

    if not (ok1 and ok2 and ok3):
        raise SystemExit("PARITY FAIL: %s" % summary)


if __name__ == "__main__":
    main()
