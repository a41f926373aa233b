"""Diagnose the u64chain follow-on-multiply failure at production scale.

Round-4 observed (twice, L_boot 26 and 27): the value-reducing refresh
decrypts correctly (post_boot_ok) but the NEXT dbfv_mul of the refreshed
ciphertext decrypts wrong, while CPU-scale analogs (n=64-256) pass the
identical pipeline.  This script isolates the cause with the repo's noise
meters and an error-pattern dump:

  * noise budget of the refreshed ciphertext's limbs (narrow meter),
  * noise budget of the follow-on product,
  * per-limb decrypt of the product vs the expected digit values
    (value-overflow shows as structural high-limb errors; noise shows as
    +-1-ish digit flips at random positions),
  * same check with a SMALL second operand (c = 3) to separate value
    magnitude from noise.

Run on an idle chip: python tools/diag_u64chain.py [--n 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--e-lo", type=int, default=15)
    ap.add_argument("--hamming", type=int, default=4)
    args = ap.parse_args()

    import jax

    from exacto_tpu import config as cfg

    cfg.enable_persistent_cache()

    from exacto_tpu import narrow as nr
    from exacto_tpu import narrow_boot as nb
    from exacto_tpu.utils.noise import narrow_noise_inf

    orig = nr.u64_dbfv_b2_chain(args.n)
    bparams = nb.auto_boot_params(orig, e_lo=args.e_lo,
                                  hamming=args.hamming,
                                  allow_insecure=True, split_base=4)
    print(json.dumps({"L_boot": len(bparams.boot.moduli),
                      "t_orig": orig.bfv.plain_modulus}), flush=True)
    sk = nr.gen_secret_key(jax.random.PRNGKey(1), orig.bfv,
                           hamming_weight=args.hamming)
    rlk = nr.gen_relin_key(jax.random.PRNGKey(2), sk)
    bk, _ = nb.gen_boot_key(jax.random.PRNGKey(3), sk, bparams)
    jax.block_until_ready(bk.rlk.rlk0)
    print("keygen done", flush=True)

    rng = np.random.default_rng(7)
    a = rng.integers(0, 1 << 64, size=2, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, size=2, dtype=np.uint64)
    ct_a = nr.dbfv_encrypt_sk(jax.random.PRNGKey(5), a, sk, orig)
    ct_b = nr.dbfv_encrypt_sk(jax.random.PRNGKey(6), b, sk, orig)
    prod = nr.dbfv_mul(ct_a, ct_b, rlk)
    jax.block_until_ready(prod.limbs.c0)

    delta = orig.bfv.delta

    def limb_noise_bits(dct):
        worst = 0
        for j in (0, 31, 63):  # sample limbs across the axis
            limb = nr.NarrowCiphertext(
                c0=dct.limbs.c0[j], c1=dct.limbs.c1[j],
                params=dct.limbs.params)
            nz = narrow_noise_inf(limb, sk)
            worst = max(worst, nz)
            print(json.dumps({"limb": j, "noise_bits":
                              float(np.log2(max(1, nz))),
                              "budget_bits":
                              float(np.log2(delta / 2 / max(1, nz)))}),
                  flush=True)
        return worst

    print("-- product noise (pre-refresh)", flush=True)
    limb_noise_bits(prod)

    t0 = time.time()
    fresh = nb.dbfv_bootstrap(prod, bk)
    jax.block_until_ready(fresh.limbs.c0)
    print(json.dumps({"refresh_s": round(time.time() - t0, 1)}), flush=True)

    got = np.asarray(nr.dbfv_decrypt(fresh, sk), dtype=np.uint64)
    print(json.dumps({"post_boot_ok": bool(np.array_equal(got, a * b))}),
          flush=True)

    print("-- refreshed-ciphertext noise", flush=True)
    limb_noise_bits(fresh)

    # digit-value sanity of the refreshed limbs: decrypt each sampled limb
    # as its own BFV plaintext
    t_orig = orig.bfv.plain_modulus
    for j in (0, 31, 63):
        limb = nr.NarrowCiphertext(c0=fresh.limbs.c0[j],
                                   c1=fresh.limbs.c1[j],
                                   params=fresh.limbs.params)
        vals = np.asarray(nr.decrypt(limb, sk))[..., 0]
        cen = np.where(vals > t_orig // 2, vals.astype(np.int64) - t_orig,
                       vals.astype(np.int64))
        print(json.dumps({"limb": j, "digit_vals": cen.tolist()}),
              flush=True)

    for cval, label in ((np.uint64(3), "small"),
                        (rng.integers(0, 1 << 64, size=2,
                                      dtype=np.uint64), "random")):
        c = np.broadcast_to(cval, (2,)).astype(np.uint64) \
            if np.isscalar(cval) or cval.ndim == 0 else cval
        ct_c = nr.dbfv_encrypt_sk(jax.random.PRNGKey(11), c, sk, orig)
        prod2 = nr.dbfv_mul(fresh, ct_c, rlk)
        got3 = np.asarray(nr.dbfv_decrypt(prod2, sk), dtype=np.uint64)
        want = (a * b) * c
        ok = bool(np.array_equal(got3, want))
        print(json.dumps({"followon": label, "ok": ok,
                          "xor_bits": [int(int(g) ^ int(w)).bit_length()
                                       for g, w in zip(got3, want)]}),
              flush=True)
        print("-- follow-on product noise (%s)" % label, flush=True)
        limb_noise_bits(prod2)


if __name__ == "__main__":
    main()
