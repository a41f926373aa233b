"""Discriminate the u64chain refresh-residual mechanism on CPU (no chip).

Round-4 measured (n=4096, u64chain): refresh residual 2^35 where ~2^32 is
needed; two candidate mechanisms (reports/bootstrap_n4096_u64chain.md):

  (a) reinterpret rounding error — the split rounding table stores
      v = round(dig * t_boot / t_orig) with a deterministic fractional
      error eps(dig) <= 1/2, which decrypt sees as ~eps * Q / t_boot;
  (b) Paterson-Stockmeyer residual within the sizing model's margin.

This script measures the refreshed-ciphertext noise of the CPU-scale
digit-split analog (p = 2^width, d = width, b = 2, split_base 4 — the
tests/test_narrow_b2.py fixture shape) across t_boot variants:

  * t_boot_factor 8 / 32 / 128 with generic primes — mechanism (a)
    predicts 1 bit of noise drop per t_boot doubling, (b) predicts none;
  * factor 8 with t_boot ONE MORE THAN A MULTIPLE OF t_orig (t_boot == 1
    mod t_orig): eps(dig) collapses from ~1/2 to dig/t_orig, so (a)
    predicts ~log2(t_orig/2/3) ~ 8 bits of drop AT NO PARAMETER COST,
    (b) again predicts none.

Run: JAX_PLATFORMS=cpu python tools/diag_split_residual.py [--n 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pick_t_boot(span: int, factor: int, residue_mod: int = 0):
    """Smallest prime >= span*factor (+ optional congruence == 1 mod m)."""
    from exacto_tpu.ring import hostmath as hm

    t = span * factor + 1
    if residue_mod:
        t = ((t + residue_mod - 2) // residue_mod) * residue_mod + 1
        while not hm.is_prime(t):
            t += residue_mod
        return t
    while not hm.is_prime(t):
        t += 1
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--width", type=int, default=8)
    ap.add_argument("--e-lo", type=int, default=11)
    ap.add_argument("--hamming", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from exacto_tpu import config as cfg

    cfg.enable_persistent_cache()

    from exacto_tpu import narrow as nr
    from exacto_tpu import narrow_boot as nb
    from exacto_tpu.utils.noise import narrow_noise_inf

    qs = nr.find_narrow_primes(args.n, 2, 30)
    ps = nr.find_narrow_primes(args.n, 3, 30, skip=qs)
    bfv = nr.NarrowParams.create(args.n, 256, qs, ps, gadget_base=1 << 21)
    orig = nr.NarrowDbfvParams(base=2, num_digits=args.width,
                               plain_modulus=1 << args.width, bfv=bfv)
    t_orig = orig.bfv.plain_modulus
    qp = 1 << args.e_lo
    span = qp * (args.hamming + 1) + 2
    delta = orig.bfv.delta

    sk = nr.gen_secret_key(jax.random.PRNGKey(1), orig.bfv,
                           hamming_weight=args.hamming)
    rlk = nr.gen_relin_key(jax.random.PRNGKey(2), sk)

    rng = np.random.default_rng(7)
    pmod = 1 << args.width
    a = rng.integers(0, pmod, size=2, dtype=np.uint64)
    b = rng.integers(0, pmod, size=2, dtype=np.uint64)
    c = rng.integers(1, pmod, size=2, dtype=np.uint64)
    ct_a = nr.dbfv_encrypt_sk(jax.random.PRNGKey(5), a, sk, orig)
    ct_b = nr.dbfv_encrypt_sk(jax.random.PRNGKey(6), b, sk, orig)
    ct_c = nr.dbfv_encrypt_sk(jax.random.PRNGKey(8), c, sk, orig)
    prod = nr.dbfv_mul(ct_a, ct_b, rlk)

    def worst_noise_bits(dct):
        worst = 0
        for j in range(dct.limbs.c0.shape[0]):
            limb = nr.NarrowCiphertext(c0=dct.limbs.c0[j],
                                       c1=dct.limbs.c1[j],
                                       params=dct.limbs.params)
            worst = max(worst, narrow_noise_inf(limb, sk))
        return float(np.log2(max(1, worst)))

    variants = [
        ("factor8", 8, 0),
        ("factor32", 32, 0),
        ("factor8_res1", 8, t_orig),
    ]
    print(json.dumps({"n": args.n, "t_orig": t_orig, "qprime": qp,
                      "span": span, "pre_noise_bits":
                      round(worst_noise_bits(prod), 2),
                      "budget_bits": round(float(np.log2(delta / 2)), 2)}),
          flush=True)
    for name, factor, res in variants:
        t_boot = pick_t_boot(span, factor, res)
        l_extra, a_boot = nb.auto_boot_sizes(orig, args.e_lo, args.hamming,
                                             t_boot_factor=factor)
        bp = nb.make_boot_params(orig, e_lo=args.e_lo,
                                 hamming=args.hamming, l_extra=l_extra,
                                 a_boot=a_boot, t_boot=t_boot,
                                 allow_insecure=True, split_base=4)
        bk, _ = nb.gen_boot_key(jax.random.PRNGKey(3), sk, bp)
        fresh = nb.dbfv_bootstrap(prod, bk)
        got = np.asarray(nr.dbfv_decrypt(fresh, sk), dtype=np.uint64)
        ok = bool(np.array_equal(got, (a * b) % pmod))
        nbits = worst_noise_bits(fresh)
        prod2 = nr.dbfv_mul(fresh, ct_c, rlk)
        got2 = np.asarray(nr.dbfv_decrypt(prod2, sk), dtype=np.uint64)
        ok2 = bool(np.array_equal(got2, (a * b * c) % pmod))
        print(json.dumps({"variant": name, "t_boot": t_boot,
                          "t_boot_mod_torig": t_boot % t_orig,
                          "l_boot": len(bp.boot.moduli),
                          "refresh_ok": ok,
                          "refresh_noise_bits": round(nbits, 2),
                          "followon_mul_ok": ok2,
                          "followon_noise_bits":
                          round(worst_noise_bits(prod2), 2)}), flush=True)


if __name__ == "__main__":
    main()
