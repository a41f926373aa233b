"""Headline benchmark: batched u64 dBFV multiplies/sec on one TPU chip.

Baseline (BASELINE.md): the Rust reference does one u64 dBFV multiply
(p=2^64, d=8, b=256, n=4096, preset `u64_dbfv`) in 31.395 ms sequentially
on CPU => ~31.85 ops/s.  Here the same operation runs as one batched tensor
program on the TPU: all 64 digit-products, their HPS RNS multiplies,
relinearizations and the lattice degree reduction fuse over a ciphertext
batch axis.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ops/s", "vs_baseline": N/31.85, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_OPS_PER_S = 1000.0 / 31.395  # reference u64 dBFV mul, d=8 profile


def main():
    import jax

    quick = "--quick" in sys.argv
    batch = int(os.environ.get("BENCH_BATCH", "16" if quick else "256"))
    iters = 2 if quick else 5

    if os.environ.get("BENCH_NARROW", "1") not in ("0", "false"):
        return main_narrow(quick, batch, iters)

    from exacto_tpu.params.presets import u64_dbfv
    from exacto_tpu.bfv import gen_relin_key, gen_secret_key
    from exacto_tpu.dbfv import dbfv_encrypt_sk, dbfv_decrypt, dbfv_mul

    if quick:
        from exacto_tpu.params import BfvParamsBuilder, DbfvParams

        bfv = (BfvParamsBuilder().ring_degree(256).plain_modulus(1040407)
               .ct_moduli([1152921504606830593])
               .aux_moduli([18014398509998081, 36028797018972161])
               .gadget_base(256).sigma(3.2).build())
        params = DbfvParams.create(bfv, 256, 8, 0)
    else:
        params = u64_dbfv()

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # jit every stage: eager dispatch over the axon tunnel is ~ms/op
    sk = jax.jit(lambda k: gen_secret_key(k, params.bfv_params))(k1)
    rlk = jax.jit(lambda k: gen_relin_key(k, sk))(k2)

    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 63, size=batch, dtype=np.uint64) * 2 + 1
    b = rng.integers(0, 1 << 63, size=batch, dtype=np.uint64) * 2 + 1
    ct1 = jax.jit(lambda k: dbfv_encrypt_sk(k, a, sk, params))(k3)
    ct2 = jax.jit(lambda k: dbfv_encrypt_sk(k, b, sk, params))(k4)

    import jax.numpy as jnp

    def step_fn(x, y, r, z):
        # chained data-dependent zero (see main_narrow) so enqueued steps
        # serialize on device and one block_until_ready measures true
        # device time; optimization_barrier keeps XLA from folding it away
        first = x.limbs.c[0]
        x = x.replace(limbs=x.limbs.replace(
            c=(x.limbs.c[0].replace(lo=first.lo + z),) + tuple(x.limbs.c[1:])))
        out = dbfv_mul(x, y, r)
        probe = jax.lax.optimization_barrier(out.limbs.c[0].lo[0, 0, 0, 0])
        return out, probe & jnp.uint32(0)

    mul = jax.jit(step_fn)
    z = jnp.uint32(0)
    t0 = time.time()
    out, z = mul(ct1, ct2, rlk, z)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        out, z = mul(ct1, ct2, rlk, z)
    jax.block_until_ready(z)
    best = (time.time() - t0) / iters
    ops = batch / best

    # correctness spot-check on a stride of batch elements (host decrypt)
    stride = max(1, batch // 16)

    def sample(tree):
        return jax.tree_util.tree_map(
            lambda x: x[::stride] if hasattr(x, "ndim") and x.ndim >= 4 else x,
            tree)

    ok = True
    try:
        got = np.asarray(dbfv_decrypt(sample(out), sk), dtype=np.uint64)
        exp = a[::stride] * b[::stride]  # uint64 wraps mod 2^64
        ok = bool(np.array_equal(got.reshape(-1), exp.reshape(-1)))
    except Exception:
        ok = False

    print(json.dumps({
        "metric": "batched u64 dBFV muls/sec/chip (p=2^64, d=8, b=256, n=%d)"
                  % params.bfv_params.ring_degree,
        "value": round(ops, 2),
        "unit": "ops/s",
        "vs_baseline": round(ops / BASELINE_OPS_PER_S, 2),
        "batch": batch,
        "step_ms": round(best * 1e3, 2),
        "stat": "mean",
        "compile_s": round(compile_s, 1),
        "parity_check": ok,
    }))


def main_narrow(quick, batch, iters):
    """Narrow-basis engine benchmark (single-u32 RNS; the TPU-first design)."""
    import jax

    from exacto_tpu import narrow as nr

    n = 256 if quick else 4096
    params = nr.u64_dbfv_fast(n)
    sk = jax.jit(lambda k: nr.gen_secret_key(k, params.bfv))(jax.random.PRNGKey(1))
    rlk = jax.jit(lambda k: nr.gen_relin_key(k, sk))(jax.random.PRNGKey(2))

    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 63, size=batch, dtype=np.uint64) * 2 + 1
    b = rng.integers(0, 1 << 63, size=batch, dtype=np.uint64) * 2 + 1
    ct1 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(3), a, sk, params)
    ct2 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(4), b, sk, params)

    import jax.numpy as jnp

    def step_fn(x, y, r, z):
        # z is a data-dependent zero from the previous step's output:
        # adding it is an exact identity, but it serializes the steps on
        # device, so one final block_until_ready measures true device time
        # while host dispatch still overlaps.  (The earlier pipelined
        # timer — enqueue N independent steps, block on the list — was
        # seen under-waiting on the remote runtime: 0.48 ms/step at batch
        # 512, below the HBM roofline.)
        x = x.replace(limbs=x.limbs.replace(c0=x.limbs.c0 + z))
        out = nr.dbfv_mul(x, y, r)
        # optimization_barrier keeps XLA's algebraic simplifier from
        # constant-folding the masked zero, so the chain is a true value
        # dependency, not just PJRT buffer readiness
        probe = jax.lax.optimization_barrier(out.limbs.c0[0, 0, 0, 0])
        return out, probe & jnp.uint32(0)

    mul = jax.jit(step_fn)
    z = jnp.uint32(0)
    t0 = time.time()
    out, z = mul(ct1, ct2, rlk, z)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    seq = os.environ.get("BENCH_SEQ", "0") not in ("0", "false")
    if seq:
        # conservative cross-check mode: block every iteration (BENCH_SEQ=1)
        # — includes one transport round trip per step.  Reports the same
        # mean statistic as throughput mode so the two are comparable.
        times = []
        for _ in range(iters):
            t0 = time.time()
            out, _ = mul(ct1, ct2, rlk, z)
            jax.block_until_ready(out)
            times.append(time.time() - t0)
        best = sum(times) / len(times)
    else:
        t0 = time.time()
        for _ in range(iters):
            out, z = mul(ct1, ct2, rlk, z)
        jax.block_until_ready(z)
        best = (time.time() - t0) / iters
    ops = batch / best

    # parity on a stride of batch elements (catches batch-position bugs a
    # single-element check misses)
    stride = max(1, batch // 16)

    def sample(tree):
        # narrow layout is [d, batch, L, n]: batch is axis 1
        return jax.tree_util.tree_map(
            lambda x: x[:, ::stride] if hasattr(x, "ndim") and x.ndim >= 4
            else x, tree)

    ok = True
    try:
        got = np.asarray(nr.dbfv_decrypt(sample(out), sk), dtype=np.uint64)
        exp = a[::stride] * b[::stride]  # uint64 wraps mod 2^64
        ok = bool(np.array_equal(got.reshape(-1), exp.reshape(-1)))
    except Exception:
        ok = False

    extra = {}
    if not quick and os.environ.get("BENCH_SWEEP", "1") not in ("0", "false"):
        # (a) blocking-per-step cross-check at the same batch: guards the
        # chained-zero timer against runtime under-wait (mean, like above)
        times = []
        for _ in range(3):
            t0 = time.time()
            o, _ = mul(ct1, ct2, rlk, z)
            jax.block_until_ready(o)
            times.append(time.time() - t0)
        extra["seq_step_ms"] = round(sum(times) / len(times) * 1e3, 2)
        # (b) batch-512 scaling point (fresh compile at the larger shape)
        try:
            b2 = 2 * batch
            a2 = rng.integers(0, 1 << 63, size=b2, dtype=np.uint64) * 2 + 1
            bb2 = rng.integers(0, 1 << 63, size=b2, dtype=np.uint64) * 2 + 1
            c1 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(5), a2, sk, params)
            c2 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(6), bb2, sk, params)
            o2, z2 = mul(c1, c2, rlk, jnp.uint32(0))
            jax.block_until_ready(o2)
            t0 = time.time()
            for _ in range(iters):
                o2, z2 = mul(c1, c2, rlk, z2)
            jax.block_until_ready(z2)
            dt2 = (time.time() - t0) / iters
            extra["b%d_step_ms" % b2] = round(dt2 * 1e3, 2)
            extra["b%d_ops_s" % b2] = round(b2 / dt2, 2)
            # throughput at 2x batch over 1x batch: 1.0 = perfect weak
            # scaling of the batch axis on one chip
            extra["batch_scaling_eff"] = round((b2 / dt2) / (2 * ops), 3)
        except Exception as exc:  # noqa: BLE001 - report, don't fail bench
            extra["sweep_error"] = str(exc)[:120]

    if not quick and os.environ.get("BENCH_B2", "1") not in ("0", "false"):
        # depth-capable profile (VERDICT r3 item 4): mul throughput of the
        # BOOTSTRAPPABLE b=2/d=64 u64 profile, so the throughput/depth
        # trade-off is a measured table, not a docstring.  Refresh cost
        # lives in reports/bootstrap_n4096_*.md (a warm refresh is minutes,
        # not bench material); BENCH_B2_REFRESH=1 opts into measuring one
        # warm batch-2 refresh here too.
        try:
            b2_batch = int(os.environ.get("BENCH_B2_BATCH", "32"))
            p2 = nr.u64_dbfv_b2(n)
            sk2 = jax.jit(lambda k: nr.gen_secret_key(k, p2.bfv))(
                jax.random.PRNGKey(11))
            rlk2 = jax.jit(lambda k: nr.gen_relin_key(k, sk2))(
                jax.random.PRNGKey(12))
            a3 = rng.integers(0, 1 << 64, size=b2_batch, dtype=np.uint64)
            b3 = rng.integers(0, 1 << 64, size=b2_batch, dtype=np.uint64)
            c31 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(13), a3, sk2, p2)
            c32 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(14), b3, sk2, p2)
            o3, z3 = mul(c31, c32, rlk2, jnp.uint32(0))
            jax.block_until_ready(o3)
            t0 = time.time()
            for _ in range(iters):
                o3, z3 = mul(c31, c32, rlk2, z3)
            jax.block_until_ready(z3)
            dt3 = (time.time() - t0) / iters
            got3 = np.asarray(nr.dbfv_decrypt(o3, sk2), dtype=np.uint64)
            extra["b2_mul_ops_s"] = round(b2_batch / dt3, 2)
            extra["b2_mul_step_ms"] = round(dt3 * 1e3, 2)
            extra["b2_mul_batch"] = b2_batch
            extra["b2_parity"] = bool(np.array_equal(got3, a3 * b3))
            if os.environ.get("BENCH_B2_REFRESH", "1") not in ("0", "false"):
                # warm batch-2 refresh of the bootstrappable u64 profile
                # (VERDICT r4 task 7: the capability table needs refresh
                # cost next to mul throughput).  Batch 2 matches the
                # reports/bootstrap_n4096_u64.md rows; first pass comes
                # from the persistent compile cache when primed, then one
                # WARM pass is the measured figure.
                from exacto_tpu import narrow_boot as nb

                bp2 = nb.auto_boot_params(p2, e_lo=13, hamming=8,
                                          allow_insecure=True)
                bk2, _ = nb.gen_boot_key(jax.random.PRNGKey(15), sk2, bp2)
                a4 = a3[:2].copy()
                b4 = b3[:2].copy()
                c41 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(16), a4, sk2, p2)
                c42 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(17), b4, sk2, p2)
                prod = nr.dbfv_mul(c41, c42, rlk2)
                fresh = nb.dbfv_bootstrap(prod, bk2)
                jax.block_until_ready(fresh.limbs.c0)
                t0 = time.time()
                fresh = nb.dbfv_bootstrap(prod, bk2)
                jax.block_until_ready(fresh.limbs.c0)
                extra["b2_refresh_s_per_value"] = round(
                    (time.time() - t0) / 2, 2)
                got4 = np.asarray(nr.dbfv_decrypt(fresh, sk2),
                                  dtype=np.uint64)
                extra["b2_refresh_parity"] = bool(
                    np.array_equal(got4, a4 * b4))
        except Exception as exc:  # noqa: BLE001 - report, don't fail bench
            extra["b2_error"] = str(exc)[:120]

    if os.environ.get("BENCH_SELFTEST", "1") not in ("0", "false"):
        # compiled kernel-vs-jnp bit-exact checks for every fused kernel on
        # the live backend (round-2 weak #3: interpret mode clamps OOB
        # indices, so only compiled runs catch the 704bff2 bug class)
        from exacto_tpu.utils.selftest import kernel_selftest

        try:
            st = kernel_selftest(n=n, batch=4)
            extra["kernel_selftest"] = st.pop("ok")
            if not extra["kernel_selftest"]:
                extra["kernel_selftest_detail"] = st
        except Exception as exc:  # noqa: BLE001
            extra["kernel_selftest"] = False
            extra["kernel_selftest_error"] = str(exc)[:120]

    print(json.dumps({
        "metric": "batched u64 dBFV muls/sec/chip (p=2^64, d=8, b=256, n=%d, "
                  "narrow RNS)" % n,
        "value": round(ops, 2),
        "unit": "ops/s",
        "vs_baseline": round(ops / BASELINE_OPS_PER_S, 2),
        "batch": batch,
        "step_ms": round(best * 1e3, 2),
        "stat": "mean",
        "compile_s": round(compile_s, 1),
        "parity_check": ok,
        **extra,
    }))


if __name__ == "__main__":
    main()
