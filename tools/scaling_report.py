"""Weak-scaling measurement on the virtual multi-device CPU mesh.

One real TPU chip is available, so absolute multi-chip scaling cannot be
measured; this reports the RELATIVE weak-scaling efficiency the sharded
program achieves when XLA partitions it across N virtual CPU devices
(per-device batch held constant, devices 1 -> 2 -> 4 -> 8).  On real ICI the
batch axis has no cross-device collectives at all (verified: the compiled
HLO below contains none for the batch-sharded multiply), so CPU-mesh
efficiency is a LOWER bound shaped by host thread contention, not by the
algorithm.

Writes reports/weak_scaling_cpu_mesh.md and prints one JSON line per point.
BASELINE.md anchor: "scaling efficiency reported at 1 chip, 1 host,
>= 2 hosts" — this is the 1-real-chip stand-in for the multi-host rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
else:
    # an inherited count < 8 would break the 8-device row with a confusing
    # mesh error deep in make_mesh; rewrite it to 8 up front (ADVICE r3)
    import re

    def _bump(m):
        return (m.group(0) if int(m.group(1)) >= 8
                else m.group(0).split("=")[0] + "=8")

    os.environ["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=(\d+)", _bump,
        os.environ["XLA_FLAGS"])
os.environ["JAX_PLATFORMS"] = "cpu"

_COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
                "reduce-scatter", "all-to-all")


def hlo_collectives(lowered_compiled) -> list:
    """Names of cross-device collective ops present in a compiled HLO."""
    txt = lowered_compiled.as_text()
    return [c for c in _COLLECTIVES if c in txt]


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--per-dev-batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--skip-limb", action="store_true",
                    help="skip the limb-sharded (explicit shard_map "
                         "collective) comparison section")
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from exacto_tpu import narrow as nr
    from exacto_tpu.parallel import make_mesh, replicate, shard_batch

    n = args.n
    params = nr.u64_dbfv_fast(n)
    bp = params.bfv
    sk = nr.gen_secret_key(jax.random.PRNGKey(1), bp)
    rlk = nr.gen_relin_key(jax.random.PRNGKey(2), sk)
    rng = np.random.default_rng(0)

    rows = []
    t1 = None
    coll_check = "NOT RUN"
    for ndev in (1, 2, 4, 8):
        B = args.per_dev_batch * ndev
        mesh = make_mesh({"batch": ndev})
        a = rng.integers(0, 1 << 63, size=B, dtype=np.uint64) * 2 + 1
        b = rng.integers(0, 1 << 63, size=B, dtype=np.uint64) * 2 + 1
        ct1 = shard_batch(
            nr.dbfv_encrypt_sk(jax.random.PRNGKey(3), a, sk, params), mesh)
        ct2 = shard_batch(
            nr.dbfv_encrypt_sk(jax.random.PRNGKey(4), b, sk, params), mesh)
        rlk_r = replicate(rlk, mesh)
        mul = jax.jit(lambda x, y, r: nr.dbfv_mul(x, y, r))
        if ndev == 8:
            # verify (not just assert) the zero-collective claim on the
            # compiled HLO of the widest mesh (ADVICE r3 medium)
            colls = hlo_collectives(
                mul.lower(ct1, ct2, rlk_r).compile())
            coll_check = "PASS (none found)" if not colls else \
                "FAIL: " + ", ".join(colls)
            print(json.dumps({"hlo_collective_check": coll_check}),
                  flush=True)
        out = mul(ct1, ct2, rlk_r)
        jax.block_until_ready(out.limbs.c0)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = mul(ct1, ct2, rlk_r)
        jax.block_until_ready(out.limbs.c0)
        dt = (time.perf_counter() - t0) / args.iters
        dec = nr.dbfv_decrypt(out, sk)
        ok = bool(np.array_equal(
            np.asarray(dec), (a * b).astype(np.uint64)))
        if ndev == 1:
            t1 = dt
        eff = t1 / dt if dt else 0.0
        row = {"devices": ndev, "batch": B, "step_ms": round(dt * 1e3, 2),
               "ops_s": round(B / dt, 1),
               "weak_scaling_eff": round(eff, 3), "parity": ok}
        rows.append(row)
        print(json.dumps(row), flush=True)

    lines = [
        "# Weak scaling on the virtual 8-device CPU mesh",
        "",
        "Per-device batch fixed at %d, narrow u64 dBFV multiply at n=%d."
        % (args.per_dev_batch, n),
        "Efficiency = t(1 dev)/t(N dev); 1.0 = perfect weak scaling.",
        "",
        "Only one real TPU chip is reachable, so these are RELATIVE numbers",
        "from XLA's SPMD partitioner over virtual CPU devices.  All virtual",
        "devices SHARE the host's cores, and the 1-device baseline already",
        "uses every core, so efficiency well below 1.0 here reflects host",
        "oversubscription, not algorithmic serialization.  The load-bearing",
        "fact is structural: the batch-sharded multiply compiles with ZERO",
        "cross-device collectives — checked at generation time by scanning",
        "the 8-device compiled HLO for all-reduce / all-gather /",
        "collective-permute / reduce-scatter / all-to-all:",
        "",
        "    HLO collective check: %s" % coll_check,
        "",
        "so on a real TPU pod slice each chip runs the whole step on its",
        "batch shard independently — weak scaling on hardware is bounded by",
        "per-chip throughput (bench.py), not by ICI.",
        "",
        "| devices | batch | step ms | ops/s | weak-scaling eff | parity |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| %d | %d | %.2f | %.1f | %.3f | %s |" % (
            r["devices"], r["batch"], r["step_ms"], r["ops_s"],
            r["weak_scaling_eff"], "PASS" if r["parity"] else "FAIL"))
    if not args.skip_limb:
        # Limb-sharded comparison (VERDICT r3 weak #4: the limb-sharded
        # path — the one that DOES emit collectives — had no committed
        # scaling measurement): the same multiply with the d=8 digit-limb
        # axis sharded over all 8 devices, routed through the EXPLICIT
        # shard_map + all_gather convolution (tensor3_conv_shardmap via
        # dbfv_mul(mesh=...)), vs the replicated single-device program at
        # the same total batch.
        from exacto_tpu.parallel import shard_batch_limb

        B = args.per_dev_batch
        a = rng.integers(0, 1 << 63, size=B, dtype=np.uint64) * 2 + 1
        b = rng.integers(0, 1 << 63, size=B, dtype=np.uint64) * 2 + 1
        ct1 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(3), a, sk, params)
        ct2 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(4), b, sk, params)
        limb_rows = []
        for ndev in (1, 8):
            if ndev == 1:
                mesh1 = make_mesh({"batch": 1})
                c1 = shard_batch(ct1, mesh1)
                c2 = shard_batch(ct2, mesh1)
                r = replicate(rlk, mesh1)
                mul = jax.jit(lambda x, y, k: nr.dbfv_mul(x, y, k))
                colls = []
            else:
                mesh8 = make_mesh({"limb": 8, "batch": 1})
                c1 = shard_batch_limb(ct1, mesh8)
                c2 = shard_batch_limb(ct2, mesh8)
                r = replicate(rlk, mesh8)
                mul = jax.jit(lambda x, y, k: nr.dbfv_mul(x, y, k,
                                                          mesh=mesh8))
                colls = hlo_collectives(mul.lower(c1, c2, r).compile())
            out = mul(c1, c2, r)
            jax.block_until_ready(out.limbs.c0)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = mul(c1, c2, r)
            jax.block_until_ready(out.limbs.c0)
            dt = (time.perf_counter() - t0) / args.iters
            dec = nr.dbfv_decrypt(out, sk)
            ok = bool(np.array_equal(np.asarray(dec),
                                     (a * b).astype(np.uint64)))
            row = {"limb_devices": ndev, "batch": B,
                   "step_ms": round(dt * 1e3, 2), "parity": ok,
                   "hlo_collectives": colls}
            limb_rows.append(row)
            print(json.dumps(row), flush=True)
        rel = limb_rows[0]["step_ms"] / limb_rows[1]["step_ms"] \
            if limb_rows[1]["step_ms"] else 0.0
        lines += [
            "",
            "## Limb-sharded multiply (explicit shard_map collectives)",
            "",
            "The d=8 digit-limb axis sharded over all 8 devices, digit",
            "convolution routed through the EXPLICIT all_gather program",
            "(`dbfv_mul(..., mesh=mesh)` ->",
            "`parallel.shardmap_conv.tensor3_conv_shardmap`), vs the same",
            "batch replicated on one device.  Host-oversubscription caveats",
            "above apply; the structural facts are the collectives emitted",
            "and parity.",
            "",
            "| limb devices | batch | step ms | speedup vs 1 dev | "
            "HLO collectives | parity |",
            "|---|---|---|---|---|---|",
        ]
        for r_ in limb_rows:
            sp = ("%.2fx" % (limb_rows[0]["step_ms"] / r_["step_ms"])
                  if r_["step_ms"] else "-")
            lines.append("| %d | %d | %.2f | %s | %s | %s |" % (
                r_["limb_devices"], r_["batch"], r_["step_ms"], sp,
                ", ".join(r_["hlo_collectives"]) or "none",
                "PASS" if r_["parity"] else "FAIL"))
        print(json.dumps({"limb_sharded_speedup_vs_1dev": round(rel, 2)}),
              flush=True)

    os.makedirs("reports", exist_ok=True)
    with open("reports/weak_scaling_cpu_mesh.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote reports/weak_scaling_cpu_mesh.md")


if __name__ == "__main__":
    main()
