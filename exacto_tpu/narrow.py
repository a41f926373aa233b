"""Narrow-basis engine: BFV/dBFV over single-u32 RNS primes (performance path).

TPU-first parameter design: instead of the reference's single 60-bit prime
(which forces every residue into emulated-u64 pair arithmetic), the
ciphertext modulus is a product of narrow NTT primes just under 2^31 and the
auxiliary basis a product of narrow primes — every hot op (NTT butterflies,
pointwise products, key-switch inner products) runs in single-lane u32
Montgomery arithmetic: ~4x fewer multiplies and half the memory traffic of
the wide path.  Pair (u64) arithmetic survives only in the per-coefficient
scale/compose glue, which after the deferred-sum restructure runs once per
output limb.

Exactness: with exactly TWO Q-primes, the CRT composition of a coefficient
fits a u64 pair (sum of two < 2^62 terms), so base extension Q->P, the HPS
rounding term, and gadget decomposition are all EXACT — no approximate
alpha-correction floats anywhere.

Scope (round 3): the full narrow capability surface — sk/pk keygen and
encryption, decrypt, add/sub/neg, the dBFV digit-convolution multiply with
deferred-sum HPS scaling + relinearization (the headline workload),
automorphisms/Galois keys, trivial/plain ops, advanced dBFV ops
(div_by_base, change_base), general-L parameter sets, and the production
bootstrap host in `narrow_boot` (modswitch, phase re-encryption, trace,
Paterson-Stockmeyer rounding eval, modswitch chain).  The wide engine
(exacto_tpu.bfv/dbfv) remains the reference-parity surface at the
reference's exact moduli.
"""

from __future__ import annotations

from functools import lru_cache

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from . import config as _config
from .errors import InvalidParam
from .ring import hostmath as hm
from .ring import wordops as w
from .ring import wordops32 as w32
from .ring.ntt import build_psi_tables  # noqa: F401  (wide tables unused here)
from .sampling import sample_gaussian_signed, sample_ternary_signed


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class NarrowBasis:
    moduli: tuple = flax.struct.field(pytree_node=False)
    ring_degree: int = flax.struct.field(pytree_node=False)
    q: jnp.ndarray = None        # [L] u32
    qinv: jnp.ndarray = None     # [L] u32  (-q^{-1} mod 2^32)
    r1: jnp.ndarray = None       # [L] u32  (2^32 mod q)
    r2: jnp.ndarray = None       # [L] u32  (2^64 mod q)
    ninv: jnp.ndarray = None     # [L] u32  (n^{-1} in Montgomery form)
    ninv_std: jnp.ndarray = None # [L] u32  (n^{-1} standard form; fuses
                                 #           from-Montgomery into the INTT)
    psi_rev: jnp.ndarray = None  # [L, n] u32 (Montgomery form)
    ipsi_rev: jnp.ndarray = None # [L, n] u32
    # standard-form twiddles + Shoup companions (floor(w*2^32/q)):
    # butterflies multiply by constants, so the 3-mul Shoup product replaces
    # 4-mul Montgomery in the NTTs (Shoup has no R^{-1}, hence std form)
    psi_std: jnp.ndarray = None     # [L, n] u32
    ipsi_std: jnp.ndarray = None    # [L, n] u32
    psi_shoup: jnp.ndarray = None   # [L, n] u32
    ipsi_shoup: jnp.ndarray = None  # [L, n] u32
    ninv_fuse: jnp.ndarray = None   # [L] u32 (n^{-1} R^{-1}: Shoup-fused
                                    #          from-Montgomery final stage)
    ninv_fuse_shoup: jnp.ndarray = None
    r1_shoup: jnp.ndarray = None    # [L] u32 (floor((2^32 mod q)*2^32/q))
    one_shoup: jnp.ndarray = None   # [L] u32 (floor(2^32/q))
    # NOTE on the fused kernels' per-stage twiddle operands: they are
    # DERIVED IN-TRACE from psi_std/ipsi_std by slice+repeat
    # (ops.ntt_pallas32.stage_tables_from_basis) — device operands keep
    # them out of the HLO (n >= 16384 compile-payload limit), and deriving
    # per program rather than persisting [L, S, n] per basis avoids the
    # HBM blowup when the bootstrap's modswitch chain instantiates params
    # at every prime level (round-5 RESOURCE_EXHAUSTED lesson).

    @classmethod
    def create(cls, moduli, n: int) -> "NarrowBasis":
        moduli = tuple(int(m) for m in moduli)
        if not w32.check_narrow(moduli):
            raise InvalidParam("narrow basis needs odd primes < 2^31")
        for m in moduli:
            if not hm.is_prime(m) or (m - 1) % (2 * n) != 0:
                raise InvalidParam(f"modulus {m} unusable for n={n}")
        consts = [w32.mont_consts32(m) for m in moduli]
        tabs = [w32.build_psi_tables32(m, n) for m in moduli]
        u32a = lambda vals: jnp.asarray(np.array(vals, dtype=np.uint32))
        return cls(
            moduli=moduli, ring_degree=n,
            q=u32a(moduli),
            qinv=u32a([c["qinv_neg"] for c in consts]),
            r1=u32a([c["r1"] for c in consts]),
            r2=u32a([c["r2"] for c in consts]),
            ninv=u32a([t["ninv"] for t in tabs]),
            ninv_std=u32a([t["ninv_std"] for t in tabs]),
            psi_rev=jnp.asarray(np.stack([t["psi_rev"] for t in tabs])),
            ipsi_rev=jnp.asarray(np.stack([t["ipsi_rev"] for t in tabs])),
            psi_std=jnp.asarray(np.stack([t["psi_std"] for t in tabs])),
            ipsi_std=jnp.asarray(np.stack([t["ipsi_std"] for t in tabs])),
            psi_shoup=jnp.asarray(np.stack([t["psi_shoup"] for t in tabs])),
            ipsi_shoup=jnp.asarray(np.stack([t["ipsi_shoup"] for t in tabs])),
            ninv_fuse=u32a([t["ninv_fuse"] for t in tabs]),
            ninv_fuse_shoup=u32a([t["ninv_fuse_shoup"] for t in tabs]),
            r1_shoup=u32a([c["r1_shoup"] for c in consts]),
            one_shoup=u32a([c["one_shoup"] for c in consts]),
        )

    @property
    def num_moduli(self):
        return len(self.moduli)

    @property
    def modulus_product(self) -> int:
        big = 1
        for m in self.moduli:
            big *= m
        return big

    def b1(self):
        return self.q.reshape(-1, 1), self.qinv.reshape(-1, 1)

    def reduce64(self, lo, hi):
        """u64 (lo, hi) [..., n] -> standard residues [..., L, n] (Shoup)."""
        return w32.reduce_u64_shoup32(
            lo, hi, self.q.reshape(-1, 1), self.r1.reshape(-1, 1),
            self.r1_shoup.reshape(-1, 1), self.one_shoup.reshape(-1, 1))


@flax.struct.dataclass
class NarrowParams:
    """BFV params over a narrow basis (2 Q-primes; 1..5 aux primes)."""

    ring_degree: int = flax.struct.field(pytree_node=False)
    plain_modulus: int = flax.struct.field(pytree_node=False)
    moduli: tuple = flax.struct.field(pytree_node=False)
    aux_moduli: tuple = flax.struct.field(pytree_node=False)
    sigma: float = flax.struct.field(pytree_node=False)
    gadget_base: int = flax.struct.field(pytree_node=False)
    gadget_digits: int = flax.struct.field(pytree_node=False)
    ct_basis: NarrowBasis = None
    aux_basis: NarrowBasis = None
    delta_mont: jnp.ndarray = None  # [L] u32, Delta mod q_i in Montgomery form

    gadget_mode: str = flax.struct.field(pytree_node=False, default="base")

    @classmethod
    def create(cls, n, plain_modulus, ct_moduli, aux_moduli, sigma=3.2,
               gadget_base=1 << 16, gadget_mode="auto"):
        """gadget_mode: "base" = balanced power-of-two digits (needs the u64
        CRT compose, so exactly 2 ct primes); "rns" = CRT-digit decomposition
        (one digit per ct prime, any L — the keyswitch style every modern
        RNS-BFV/CKKS library uses at large L); "auto" picks base at L=2."""
        ct_moduli = tuple(int(m) for m in ct_moduli)
        aux_moduli = tuple(int(m) for m in aux_moduli)
        if len(ct_moduli) < 1:
            raise InvalidParam("need at least one ciphertext prime")
        if gadget_mode == "auto":
            gadget_mode = "base" if len(ct_moduli) == 2 else "rns"
        if gadget_mode == "base" and len(ct_moduli) != 2:
            raise InvalidParam("balanced-base gadget needs exactly 2 ct "
                               "primes (u64 CRT compose); use gadget_mode="
                               "'rns' for general L")
        ct_basis = NarrowBasis.create(ct_moduli, n)
        aux_basis = NarrowBasis.create(aux_moduli, n)
        big_q = ct_basis.modulus_product
        if gadget_mode == "rns":
            digits = len(ct_moduli)
        else:
            digits = 0
            powv = 1
            while powv < big_q:
                powv *= gadget_base
                digits += 1
        delta = big_q // plain_modulus
        dm = np.array([delta % m * (1 << 32) % m for m in ct_moduli],
                      dtype=np.uint64).astype(np.uint32)
        return cls(ring_degree=n, plain_modulus=int(plain_modulus),
                   moduli=ct_moduli, aux_moduli=aux_moduli, sigma=float(sigma),
                   gadget_base=int(gadget_base), gadget_digits=max(digits, 1),
                   gadget_mode=gadget_mode,
                   ct_basis=ct_basis, aux_basis=aux_basis,
                   delta_mont=jnp.asarray(dm))

    @property
    def big_q(self) -> int:
        return self.ct_basis.modulus_product

    @property
    def delta(self) -> int:
        return self.big_q // self.plain_modulus


@flax.struct.dataclass
class NarrowDbfvParams:
    base: int = flax.struct.field(pytree_node=False)
    num_digits: int = flax.struct.field(pytree_node=False)
    plain_modulus: int = flax.struct.field(pytree_node=False)  # 0 => 2^64
    bfv: NarrowParams = None

    @property
    def effective_plain_modulus(self) -> int:
        return (1 << 64) if self.plain_modulus == 0 else self.plain_modulus


@lru_cache(maxsize=None)
def find_narrow_primes(n: int, count: int, max_bits: int = 31,
                       skip: tuple = ()) -> tuple:
    """`count` NTT-friendly primes just below 2^max_bits for ring degree n."""
    out = []
    k = ((1 << max_bits) - 1) // (2 * n) * (2 * n) + 1
    while len(out) < count and k > 1 << (max_bits - 3):
        if hm.is_prime(k) and k not in skip:
            out.append(k)
        k -= 2 * n
    if len(out) < count:
        raise InvalidParam("not enough narrow NTT primes")
    return tuple(out)


@lru_cache(maxsize=None)
def u64_dbfv_fast(n: int = 4096) -> NarrowDbfvParams:
    """Performance preset matching u64_dbfv's capability (p=2^64, b=256, d=8)
    with a TPU-first narrow basis: Q = two ~30-bit primes (2^60, matching
    the reference), P = three ~30-bit primes (2^90, above the pre-scale
    fold bound fold_factor*d*n*Q/2 ~ 2^85 with 2^5 slack); gadget base 2^21
    (3 digits — keyswitch noise ~2^31 per limb vs the Delta/2 ~ 2^40
    budget).  Primes below 2^30 (4q < 2^32) enable the Harvey LAZY butterfly
    chains in the Pallas kernels — values ride in [0, 2q) so the Shoup
    conditional subtract drops from every twiddle product."""
    qs = find_narrow_primes(n, 2, 30)
    ps = find_narrow_primes(n, 3, 30, skip=qs)
    bfv = NarrowParams.create(n, 1040407, qs, ps, gadget_base=1 << 21)
    if n >= 4096:
        # production shape: enforce the calibrated security estimate
        import math

        from .params.security import estimate_security_bits

        log2q = math.log2(bfv.big_q)
        est = estimate_security_bits(n, log2q)
        if est < 128:
            raise InvalidParam(
                f"u64_dbfv_fast(n={n}): estimated security {est:.0f} < 128")
    return NarrowDbfvParams(base=256, num_digits=8, plain_modulus=0, bfv=bfv)


@lru_cache(maxsize=None)
def u64_dbfv_d4(n: int = 4096) -> NarrowDbfvParams:
    """u64 profile 1 of the reference paper harness (d=4, b=2^16,
    t = 2^35-1; /root/reference/src/bin/paper_repro.rs:43-66) — made
    CORRECT: the reference runs it over a 60-bit Q, leaving Delta/2 = 2^24
    far below the ~2^51 multiply noise, so its own repro reports
    numerically wrong products (reports/paper_reproduction.md row 1).
    A 3-prime narrow Q (~2^90) gives Delta/2 ~ 2^54 and exact parity.  The
    HPS round term (|r| <= t/2 ~ 2^34) lifts through a 2-aux-prime CRT pair.

    Use a SPARSE secret (gen_secret_key(..., hamming_weight=64)): the
    dominant post-mul noise at this t is the HPS rounding term
    ~ (t/2) * ||s||_1 ~ 2^34 * ||s||_1, so the dense-ternary ||s||_1 ~
    2n/3 = 2731 would overflow Delta/2 ~ 2^54; h = 64 leaves ~8 bits of
    margin (the same sparse-secret technique CKKS/BFV bootstrapping stacks
    use).  SECURITY CAVEAT: the HE-standard tables (and this repo's
    estimator) assume uniform ternary secrets, for which n=4096 /
    log2 Q ~ 90 clears 128 bits; a sparse h=64 secret admits
    hybrid/combinatorial attacks that reduce concrete security below that
    figure by an amount this repo does not quantify.  Treat this preset as
    a correctness/performance profile, not a 128-bit-secure deployment."""
    qs = find_narrow_primes(n, 3, 30)
    ps = find_narrow_primes(n, 4, 30, skip=qs)
    bfv = NarrowParams.create(n, (1 << 35) - 1, qs, ps, gadget_mode="rns")
    return NarrowDbfvParams(base=1 << 16, num_digits=4, plain_modulus=0,
                            bfv=bfv)


@lru_cache(maxsize=None)
def u64_dbfv_b2(n: int = 4096) -> NarrowDbfvParams:
    """BOOTSTRAPPABLE u64 profile: p = 2^64 as d = 64 BINARY digits (b = 2),
    t = 2^8.  The flagship d=8/b=256 profile (u64_dbfv_fast) needs
    t = 1040407 > 2d(b-1)^2, and no rounding-polynomial bootstrap can reach
    a t that large: the interpolation domain is every reachable re-encrypted
    phase z, |z| <= q'(h+2)/2 with t | q', so the polynomial degree is
    ~ q'(h+1) >= 32*t*(h+1) ~ 2^25 multiplies at t ~ 2^20 — structurally
    infeasible (this also rules out the t = 2^21 variant of the flagship).
    The base-2 profile keeps every post-multiply limb value <= d = 64
    (digit products are 0/1; for p = b^d the degree-reduction reps are all
    zero, so limbs j >= d are simply dropped), so t = 2^8 > 2*64 suffices
    — and t = 2^8 | 2^e_lo makes the narrow_boot rounding pipeline apply
    as-is with degree ~ 2^13 (h+1): the SAME pipeline the n=4096 demo runs,
    at u64 capability.  Trade-off: the limb convolution is d=64 Karatsuba
    (3^6 = 729 products vs 27 at d=8), so per-multiply throughput is lower;
    this is the depth-capable profile, u64_dbfv_fast stays the throughput
    profile.  Reference contract this enables at production parameters:
    dbfv_mul_then_bootstrap / dbfv_mul_chain_then_bootstrap,
    /root/reference/src/bootstrap/bfv_host.rs:242-288 (the reference itself
    only ever bootstraps n=16 toys).

    Noise: post-mul limb values <= 64 need t > 128 for signed recompose;
    mul noise ~ t*2n ~ 2^21 against Delta/2 = Q/(2t) ~ 2^51."""
    qs = find_narrow_primes(n, 2, 30)
    ps = find_narrow_primes(n, 3, 30, skip=qs)
    bfv = NarrowParams.create(n, 256, qs, ps, gadget_base=1 << 21)
    return NarrowDbfvParams(base=2, num_digits=64, plain_modulus=0, bfv=bfv)


@lru_cache(maxsize=None)
def u64_dbfv_b2_chain(n: int = 4096) -> NarrowDbfvParams:
    """CHAIN variant of u64_dbfv_b2: t = 2^11 so the value-reducing
    (digit-split) bootstrap closes the loop on limb magnitudes.  The
    fixpoint: the split emits n_split_digits = log4(t/2) = 5 base-4 digits
    per limb, bounding refreshed limb values at V = 5*3 = 15; an
    accumulator x fresh multiply then sums <= d = 64 products of
    V x bit, so post-mul limbs are <= 960 < t/2 = 1024 — every chain step
    re-enters the bootstrap in range, for unlimited left-fold depth
    (narrow_boot.dbfv_bootstrap_split; t = 2^8 has no such fixpoint).
    Reference contract: dbfv_mul_chain_then_bootstrap,
    /root/reference/src/bootstrap/bfv_host.rs:258-288."""
    qs = find_narrow_primes(n, 2, 30)
    ps = find_narrow_primes(n, 3, 30, skip=qs)
    bfv = NarrowParams.create(n, 2048, qs, ps, gadget_base=1 << 21)
    return NarrowDbfvParams(base=2, num_digits=64, plain_modulus=0, bfv=bfv)


# ---------------------------------------------------------------------------
# polynomial ops (single u32 [..., L, n], Montgomery NTT domain)
# ---------------------------------------------------------------------------

def np_add(basis, a, b):
    return w32.mod_add32(a, b, basis.q.reshape(-1, 1))


def np_sub(basis, a, b):
    return w32.mod_sub32(a, b, basis.q.reshape(-1, 1))


def np_neg(basis, a):
    return w32.mod_neg32(a, basis.q.reshape(-1, 1))


def np_mul(basis, a, b):
    q, qi = basis.b1()
    return w32.mont_mul32(a, b, q, qi)


def _use_fused_ntt(basis) -> bool:
    from .ops import ntt_pallas32 as npal

    return (_config.pallas_ntt_enabled()
            and npal.supported(basis.ring_degree))


def from_coeff_residues32(basis, x):
    """Standard-form u32 residues [..., L, n] -> NTT-Montgomery domain."""
    if _use_fused_ntt(basis):
        from .ops import ntt_pallas32 as npal

        return npal.ntt_fwd32_fused(
            x, basis.moduli, to_mont=True,
            interpret=jax.default_backend() != "tpu",
            tables=npal.stage_tables_from_basis(basis, "fwd"))
    q, qi = basis.b1()
    xm = w32.to_mont32(x, q, qi, basis.r2.reshape(-1, 1))
    return w32.ntt_fwd32(xm, basis.psi_std, basis.q, basis.qinv,
                         psi_shoup=basis.psi_shoup)


def to_coeff_residues32(basis, x):
    """NTT-Montgomery -> standard-form u32 residues [..., L, n]."""
    if _use_fused_ntt(basis):
        from .ops import ntt_pallas32 as npal

        return npal.ntt_inv32_fused(
            x, basis.moduli, from_mont=True,
            interpret=jax.default_backend() != "tpu",
            tables=npal.stage_tables_from_basis(basis, "inv"))
    # the final multiply fuses from-Montgomery in (Shoup form: n^{-1} R^{-1})
    return w32.ntt_inv32(x, basis.ipsi_std, basis.ninv_fuse, basis.q,
                         basis.qinv, ipsi_shoup=basis.ipsi_shoup,
                         ninv_shoup=basis.ninv_fuse_shoup)


def from_signed32(basis, v):
    """Small signed int32 [..., n] -> narrow poly (broadcast to L)."""
    v = jnp.asarray(v, dtype=jnp.int32)[..., None, :]
    mag = jnp.abs(v).astype(jnp.uint32)
    q = basis.q.reshape(-1, 1)
    res = jnp.where(v < 0, q - mag, mag)
    res = jnp.where(mag == 0, 0, res).astype(jnp.uint32)
    return from_coeff_residues32(basis, res)


def from_u64_coeffs32(basis, lo, hi):
    """Arbitrary u64 coefficients (lo, hi u32 [..., n]) -> narrow poly."""
    red = basis.reduce64(lo[..., None, :], hi[..., None, :])
    return from_coeff_residues32(basis, red)


def sample_uniform32(key, basis, batch_shape=()):
    shape = tuple(batch_shape) + (basis.num_moduli, basis.ring_degree)
    bits = jax.random.bits(key, shape=(2,) + shape, dtype=jnp.uint32)
    red = basis.reduce64(bits[0], bits[1])
    return from_coeff_residues32(basis, red)


# ---------------------------------------------------------------------------
# keys / encrypt / decrypt
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class NarrowSecretKey:
    poly: jnp.ndarray = None
    params: NarrowParams = None
    # signed ternary coefficients [n] int32 — kept so the bootstrap can
    # re-embed the same secret in the boot basis (circular security,
    # reference bfv_host.rs:292-325) and noise meters can phase-check
    signed: jnp.ndarray = None

    def destroy(self) -> None:
        """Best-effort key hygiene (the reference zeroizes SecretKey on
        Drop via the zeroize crate, keygen.rs:13-26).  JAX arrays are
        immutable, so in-place zeroization is impossible; instead the
        device/host buffers are FREED immediately (jax.Array.delete)
        rather than lingering until GC.  Any later use of this key raises
        a deleted-buffer error — matching Rust's use-after-drop contract
        at the API level."""
        for buf in (self.poly, self.signed):
            if buf is not None and hasattr(buf, "delete"):
                try:
                    buf.delete()
                except Exception:
                    pass


@flax.struct.dataclass
class NarrowRelinKey:
    rlk0: jnp.ndarray = None  # [D, L, n]
    rlk1: jnp.ndarray = None
    params: NarrowParams = None


@flax.struct.dataclass
class NarrowPublicKey:
    pk0: jnp.ndarray = None
    pk1: jnp.ndarray = None
    params: NarrowParams = None


def gen_secret_key(key, params: NarrowParams,
                   hamming_weight: int | None = None) -> NarrowSecretKey:
    """Ternary secret; optional sparse secret with `hamming_weight` nonzeros
    (the bootstrap phase-bound trick, same as the wide engine's keygen)."""
    if hamming_weight is None:
        s = sample_ternary_signed(key, (params.ring_degree,))
    else:
        k_perm, k_sign = jax.random.split(key)
        perm = jax.random.permutation(k_perm, params.ring_degree)
        mask = (jnp.argsort(perm) < hamming_weight).astype(jnp.int32)
        signs = jax.random.bits(k_sign, shape=(params.ring_degree,),
                                dtype=jnp.uint32) & 1
        s = mask * jnp.where(signs == 1, 1, -1).astype(jnp.int32)
    return NarrowSecretKey(poly=from_signed32(params.ct_basis, s),
                           params=params, signed=s)


def gen_public_key(key, sk: NarrowSecretKey) -> NarrowPublicKey:
    """pk = (-(a s + e), a) over the narrow basis."""
    params = sk.params
    basis = params.ct_basis
    k_a, k_e = jax.random.split(key)
    a = sample_uniform32(k_a, basis)
    e = from_signed32(basis, sample_gaussian_signed(k_e, params.sigma,
                                                   (params.ring_degree,)))
    pk0 = np_neg(basis, np_add(basis, np_mul(basis, a, sk.poly), e))
    return NarrowPublicKey(pk0=pk0, pk1=a, params=params)


def gen_relin_key(key, sk: NarrowSecretKey) -> NarrowRelinKey:
    params = sk.params
    basis = params.ct_basis
    D = params.gadget_digits
    k_a, k_e = jax.random.split(key)
    a = sample_uniform32(k_a, basis, (D,))
    e = from_signed32(basis, sample_gaussian_signed(k_e, params.sigma,
                                                   (D, params.ring_degree)))
    s_sq = np_mul(basis, sk.poly, sk.poly)
    g = jnp.asarray(_gadget_matrix(params))[..., None]  # [D, L, 1]
    q, qi = basis.b1()
    g_ssq = w32.mont_mul32(s_sq, g, q, qi)
    rlk0 = np_add(basis, np_neg(basis, np_add(basis, np_mul(basis, a, sk.poly), e)),
                  g_ssq)
    return NarrowRelinKey(rlk0=rlk0, rlk1=a, params=params)


@flax.struct.dataclass
class NarrowCiphertext:
    c0: jnp.ndarray = None  # [..., L, n] u32 (may carry a limb axis at -3)
    c1: jnp.ndarray = None
    c2: jnp.ndarray = None  # None unless mid-multiply
    # Optional coefficient-domain shadows (standard-form residues, same
    # shape).  The dBFV multiply's base extension needs coefficient form;
    # carrying it from encryption (where the INTT is off the hot path)
    # removes 4 batched INTT sweeps per multiply.  Ops that cannot keep the
    # shadows cheaply (e.g. automorphisms) drop them; the multiply falls
    # back to an INTT when absent.
    c0c: jnp.ndarray = None
    c1c: jnp.ndarray = None
    params: NarrowParams = None


def encrypt_sk(key, coeffs_u64: np.ndarray, sk: NarrowSecretKey,
               delta_scale=True) -> NarrowCiphertext:
    """coeffs_u64 host uint64 [..., n]; one ct per leading row."""
    params = sk.params
    basis = params.ct_basis
    lo, hi = w.to_pair_np(np.asarray(coeffs_u64, dtype=np.uint64))
    m_poly = from_u64_coeffs32(basis, jnp.asarray(lo), jnp.asarray(hi))
    if delta_scale:
        q, qi = basis.b1()
        m_poly = w32.mont_mul32(m_poly, params.delta_mont[:, None], q, qi)
    batch = np.asarray(coeffs_u64).shape[:-1]
    k_a, k_e = jax.random.split(key)
    a = sample_uniform32(k_a, basis, batch)
    e = from_signed32(basis, sample_gaussian_signed(
        k_e, params.sigma, tuple(batch) + (params.ring_degree,)))
    c0 = np_add(basis, np_add(basis, np_neg(basis, np_mul(basis, a, sk.poly)), e),
                m_poly)
    return NarrowCiphertext(c0=c0, c1=a, params=params,
                            c0c=to_coeff_residues32(basis, c0),
                            c1c=to_coeff_residues32(basis, a))


def encrypt_pk(key, coeffs_u64: np.ndarray, pk: NarrowPublicKey,
               delta_scale=True) -> NarrowCiphertext:
    """Public-key encryption: ct = (pk0 u + e1 + Delta m, pk1 u + e2)."""
    params = pk.params
    basis = params.ct_basis
    lo, hi = w.to_pair_np(np.asarray(coeffs_u64, dtype=np.uint64))
    m_poly = from_u64_coeffs32(basis, jnp.asarray(lo), jnp.asarray(hi))
    if delta_scale:
        q, qi = basis.b1()
        m_poly = w32.mont_mul32(m_poly, params.delta_mont[:, None], q, qi)
    batch = np.asarray(coeffs_u64).shape[:-1]
    k_u, k_e1, k_e2 = jax.random.split(key, 3)
    u = from_signed32(basis, (jax.random.bits(
        k_u, shape=tuple(batch) + (params.ring_degree,),
        dtype=jnp.uint32) & 1).astype(jnp.int32))
    e1 = from_signed32(basis, sample_gaussian_signed(
        k_e1, params.sigma, tuple(batch) + (params.ring_degree,)))
    e2 = from_signed32(basis, sample_gaussian_signed(
        k_e2, params.sigma, tuple(batch) + (params.ring_degree,)))
    c0 = np_add(basis, np_add(basis, np_mul(basis, pk.pk0, u), e1), m_poly)
    c1 = np_add(basis, np_mul(basis, pk.pk1, u), e2)
    return NarrowCiphertext(c0=c0, c1=c1, params=params,
                            c0c=to_coeff_residues32(basis, c0),
                            c1c=to_coeff_residues32(basis, c1))


def dbfv_encrypt(key, values, pk: NarrowPublicKey,
                 params: "NarrowDbfvParams") -> "NarrowDbfvCiphertext":
    """Public-key dBFV encryption over the narrow basis (limb axis leading)."""
    limbs = encrypt_pk(key, _digit_polys(values, params), pk)
    return NarrowDbfvCiphertext(limbs=limbs, mul_depth=0, params=params)


def decrypt(ct: NarrowCiphertext, sk: NarrowSecretKey) -> np.ndarray:
    """Host CRT decrypt -> uint64 coefficients mod p."""
    params = ct.params
    basis = params.ct_basis
    phase = np_add(basis, ct.c0, np_mul(basis, ct.c1, sk.poly))
    if ct.c2 is not None:
        s_sq = np_mul(basis, sk.poly, sk.poly)
        phase = np_add(basis, phase, np_mul(basis, ct.c2, s_sq))
    res = np.asarray(to_coeff_residues32(basis, phase)).astype(np.uint64)
    from .native import available as native_ok, crt_round_scale

    if native_ok() and len(basis.moduli) == 2:
        return crt_round_scale(res, basis.moduli, params.plain_modulus)
    # general-L host CRT + round-scale via numpy object bigints (vectorized
    # over the whole batch; host verification path, not a hot op)
    big_q = params.big_q
    ts = [(big_q // m) * hm.mod_inv((big_q // m) % m, m)
          for m in basis.moduli]
    obj = res.astype(object)
    x = ts[0] * obj[..., 0, :]
    for i in range(1, len(basis.moduli)):
        x = x + ts[i] * obj[..., i, :]
    x = x % big_q
    p = params.plain_modulus
    out = (x * p + big_q // 2) // big_q % p
    return out.astype(np.uint64)


# ---------------------------------------------------------------------------
# exact pair composition and the narrow HPS machinery
# ---------------------------------------------------------------------------

def _compose_pair(params: NarrowParams, res):
    """EXACT CRT composition of 2-prime residues into a u64 pair mod Q.

    x = y0*(Q/q0) + y1*(Q/q1) - alpha*Q with y_i = x_i * (Q/q_i)^{-1} mod q_i;
    the sum is < 2Q < 2^63 so one conditional subtract recovers x exactly.
    res: standard-form u32 [..., 2, n].  Returns (lo, hi) u32 [..., n].
    """
    basis = params.ct_basis
    q0, q1 = basis.moduli
    big_q = basis.modulus_product
    inv0 = hm.mod_inv((big_q // q0) % q0, q0)
    inv1 = hm.mod_inv((big_q // q1) % q1, q1)
    y0 = w32.shoup_mul32(res[..., 0, :], jnp.uint32(inv0),
                         jnp.uint32(w32.shoup_const32(inv0, q0)),
                         jnp.uint32(q0))
    y1 = w32.shoup_mul32(res[..., 1, :], jnp.uint32(inv1),
                         jnp.uint32(w32.shoup_const32(inv1, q1)),
                         jnp.uint32(q1))
    # y0*(Q/q0): u32 x const<2^31 -> u64 pair via w.mul64 on (y, 0) pairs
    z = jnp.zeros_like(y0)
    f0 = w.const_pair(big_q // q0)
    f1 = w.const_pair(big_q // q1)
    p0 = w.mul64((y0, z), f0)
    p1 = w.mul64((y1, z), f1)
    s = w.add128(p0, p1)
    x = (s[0], s[1])  # < 2Q < 2^63 so high words are zero
    qp = w.const_pair(big_q)
    return w.select64(w.ge64(x, qp), w.sub64(x, qp), x)


@lru_cache(maxsize=None)
def _narrow_hps_consts(moduli: tuple, aux_moduli: tuple, p: int):
    big_q = 1
    for m in moduli:
        big_q *= m
    big_p = 1
    for m in aux_moduli:
        big_p *= m
    # Garner mixed-radix tables: inv(p_i) mod p_j for i < j, the mixed-radix
    # digits of floor(P/2) (for the sign compare), and p_j mod q_i for the
    # Horner evaluation of m mod q_i.  All constants carry Shoup companions
    # (floor(w*2^32/q)) — every multiply here is by a host constant, so the
    # 3-mul Shoup product replaces 4-mul Montgomery throughout.
    sh = w32.shoup_const32
    garner_inv = tuple(
        tuple(hm.mod_inv(aux_moduli[i] % pj, pj) for i in range(j))
        for j, pj in enumerate(aux_moduli))
    half_digits = []
    rem = big_p // 2
    for pj in aux_moduli:
        half_digits.append(rem % pj)
        rem //= pj
    qinv_pj = tuple(hm.mod_inv(big_q % m, m) for m in aux_moduli)
    p_qi = tuple(p % m for m in moduli)
    pj_qi = tuple(tuple(pj % m for pj in aux_moduli) for m in moduli)
    c = {
        "big_q": big_q,
        "big_p": big_p,
        "phi": (p << 126) // big_q + (1 if ((p << 126) % big_q) * 2 >= big_q else 0),
        # per aux prime: Q^{-1} mod p_j (standard + shoup)
        "qinv_pj": qinv_pj,
        "qinv_pj_sh": tuple(sh(v, m) for v, m in zip(qinv_pj, aux_moduli)),
        # per ct prime: p mod q_i, P mod q_i
        "p_qi": p_qi,
        "p_qi_sh": tuple(sh(v, m) for v, m in zip(p_qi, moduli)),
        "pmodq": tuple(big_p % m for m in moduli),
        "garner_inv": garner_inv,
        "garner_inv_sh": tuple(
            tuple(sh(v, pj) for v in row)
            for row, pj in zip(garner_inv, aux_moduli)),
        "half_digits": tuple(half_digits),
        "pj_qi": pj_qi,
        "pj_qi_sh": tuple(tuple(sh(v, m) for v in row)
                          for row, m in zip(pj_qi, moduli)),
    }
    return c


# ---------------------------------------------------------------------------
# general-L glue: Garner mixed-radix over the ct primes (any L >= 1)
# ---------------------------------------------------------------------------
#
# The 2-prime hot path composes t mod Q into one u64 pair.  For L > 2 (the
# bootstrap's boot scheme needs Q_boot of 13+ narrow primes) every "compose"
# becomes a Garner mixed-radix chain instead: digits v_j < q_j with
# x = v_0 + q_0 (v_1 + q_1 (v_2 + ...)), sign via lexicographic digit
# compare against floor(Q/2), and "x mod p" via a Horner sweep — all
# single-u32 Shoup products, no wide accumulators at any L.  This is the
# TPU-native replacement for the reference's BigInt multi-prime fallback
# (/root/reference/src/bfv/eval.rs:113-147).


@lru_cache(maxsize=None)
def _garner_consts(moduli: tuple):
    """Host tables for Garner decomposition over `moduli`: pairwise inverses
    inv[j][i] = q_i^{-1} mod q_j (+ Shoup companions), the mixed-radix
    digits of floor(Q/2) for the sign compare, and per-prime reduction
    constants."""
    sh = w32.shoup_const32
    big = 1
    for m in moduli:
        big *= m
    inv = tuple(tuple(hm.mod_inv(moduli[i] % mj, mj) for i in range(j))
                for j, mj in enumerate(moduli))
    inv_sh = tuple(tuple(sh(v, mj) for v in row)
                   for row, mj in zip(inv, moduli))
    half_digits = []
    rem = big // 2
    for mj in moduli:
        half_digits.append(rem % mj)
        rem //= mj
    one_sh = tuple(w32.mont_consts32(m)["one_shoup"] for m in moduli)
    return {"big": big, "inv": inv, "inv_sh": inv_sh,
            "half_digits": tuple(half_digits), "one_sh": one_sh}


def _garner_digits(moduli: tuple, res):
    """Standard-form residues [..., L, n] -> (digits, neg): digits is a list
    of L tensors [..., n] (digit j < q_j), neg the x > Q/2 mask."""
    cst = _garner_consts(moduli)
    vs = []
    for j, mj in enumerate(moduli):
        mjs = jnp.uint32(mj)
        one_sh = jnp.uint32(cst["one_sh"][j])
        x = res[..., j, :]
        for i in range(j):
            vi = w32.shoup_reduce32(vs[i], mjs, one_sh)
            x = w32.mod_sub32(x, vi, mjs)
            x = w32.shoup_mul32(x, jnp.uint32(cst["inv"][j][i]),
                                jnp.uint32(cst["inv_sh"][j][i]), mjs)
        vs.append(x)
    neg = jnp.zeros_like(vs[0], dtype=bool)
    for j in range(len(moduli)):
        hj = jnp.uint32(cst["half_digits"][j])
        neg = (vs[j] > hj) | ((vs[j] == hj) & neg)
    return vs, neg


@lru_cache(maxsize=None)
def _horner_consts(moduli: tuple, p: int):
    """Host: q_j mod p (+ Shoup) for the Horner sweep and Q mod p for the
    centered correction, all w.r.t. target prime p."""
    sh = w32.shoup_const32
    cst = _garner_consts(moduli)
    qmod = tuple(m % p for m in moduli)
    return {"qmod": qmod, "qmod_sh": tuple(sh(v, p) for v in qmod),
            "bigmod": cst["big"] % p,
            "one_sh": w32.mont_consts32(p)["one_shoup"]}


def _horner_mod(moduli: tuple, vs, neg, p: int):
    """Centered x mod p from Garner digits: Horner top-down, then subtract
    Q mod p where x > Q/2 (exact centered base extension to prime p)."""
    hc = _horner_consts(moduli, p)
    ps = jnp.uint32(p)
    one_sh = jnp.uint32(hc["one_sh"])
    L = len(moduli)
    acc = w32.shoup_reduce32(vs[L - 1], ps, one_sh)
    for j in range(L - 2, -1, -1):
        vj = w32.shoup_reduce32(vs[j], ps, one_sh)
        acc = w32.mod_add32(
            w32.shoup_mul32(acc, jnp.uint32(hc["qmod"][j]),
                            jnp.uint32(hc["qmod_sh"][j]), ps), vj, ps)
    return jnp.where(neg, w32.mod_sub32(acc, jnp.uint32(hc["bigmod"]), ps),
                     acc)


# --- scan forms of the same glue -------------------------------------------
#
# The unrolled chains above emit O(L^2) (Garner) and O(L*T) (Horner) HLO
# ops per use; at bootstrap scale (L = 17 ct primes) XLA's optimization
# passes go superlinear on the resulting programs (measured: 35 min for
# one bfv_mul32 compile on the TPU compile service, 30+ GB RSS on CPU).
# The lax.scan forms below emit O(1) ops regardless of L — same math,
# same sequential dependency structure — and are selected automatically
# for L >= _SCAN_MIN_L (the unrolled forms stay for the small-L hot
# paths, where loop overhead would cost more than it saves).

_SCAN_MIN_L = 6


def _garner_digits_stacked(moduli: tuple, res):
    """Unrolled Garner with the scan API: (digits [L, ..., n], neg)."""
    vs, neg = _garner_digits(moduli, res)
    return jnp.stack(vs, axis=0), neg


def _garner_digits_scan(moduli: tuple, res):
    """Scan form of _garner_digits: [..., L, n] -> (digits [L, ..., n]
    stacked on axis 0, neg mask)."""
    cst = _garner_consts(moduli)
    L = len(moduli)
    q = jnp.asarray(np.array(moduli, dtype=np.uint32))
    one_sh = jnp.asarray(np.array(cst["one_sh"], dtype=np.uint32))
    inv = np.zeros((L, L), dtype=np.uint32)
    inv_sh = np.zeros((L, L), dtype=np.uint32)
    for j, row in enumerate(cst["inv"]):
        inv[j, :j] = row
        inv_sh[j, :j] = cst["inv_sh"][j]
    inv = jnp.asarray(inv)
    inv_sh = jnp.asarray(inv_sh)
    res_l = jnp.moveaxis(res, -2, 0)  # [L, ..., n]

    def outer(digs, xs):
        j, xj = xs
        mj = q[j]
        osh = one_sh[j]

        def inner(x, ys):
            i, di = ys
            vi = w32.shoup_reduce32(di, mj, osh)
            xn = w32.mod_sub32(x, vi, mj)
            xn = w32.shoup_mul32(xn, inv[j, i], inv_sh[j, i], mj)
            return jnp.where(i < j, xn, x), None

        # inner fully unrolled: O(L) ops per outer trip keeps the whole
        # program O(L) while killing the L^2 scan-trip overhead that made
        # the first scan version 2x slower at runtime
        x, _ = jax.lax.scan(inner, xj, (jnp.arange(L, dtype=jnp.uint32),
                                        digs), unroll=True)
        return jax.lax.dynamic_update_index_in_dim(digs, x, j, 0), None

    digs0 = jnp.zeros_like(res_l)
    # outer partially unrolled: program stays O(4L), trip count L/4
    digs, _ = jax.lax.scan(outer, digs0,
                           (jnp.arange(L, dtype=jnp.uint32), res_l),
                           unroll=4)

    half = jnp.asarray(np.array(cst["half_digits"], dtype=np.uint32))

    def sign_step(neg, xs):
        j, dj = xs
        hj = half[j]
        return (dj > hj) | ((dj == hj) & neg), None

    neg, _ = jax.lax.scan(sign_step,
                          jnp.zeros(res_l.shape[1:], dtype=bool),
                          (jnp.arange(L, dtype=jnp.uint32), digs),
                          unroll=True)
    return digs, neg


@lru_cache(maxsize=None)
def _horner_all_consts(moduli: tuple, targets: tuple):
    sh = w32.shoup_const32
    cst = _garner_consts(moduli)
    qmod = np.array([[m % p for p in targets] for m in moduli],
                    dtype=np.uint32)
    qmod_sh = np.array([[sh(m % p, p) for p in targets] for m in moduli],
                       dtype=np.uint32)
    return {
        "qmod": qmod, "qmod_sh": qmod_sh,
        "bigmod": np.array([cst["big"] % p for p in targets],
                           dtype=np.uint32),
        "one_sh": np.array([w32.mont_consts32(p)["one_shoup"]
                            for p in targets], dtype=np.uint32),
        "p": np.array(targets, dtype=np.uint32),
    }


def _horner_mod_all(moduli: tuple, digs, neg, targets: tuple):
    """Scan form of _horner_mod for ALL target primes at once: digits
    [L, ..., n] (from _garner_digits_scan) -> centered x mod p for each
    target, stacked [..., T, n]."""
    hc = _horner_all_consts(moduli, targets)
    L = len(moduli)
    ps = jnp.asarray(hc["p"]).reshape(-1, 1)          # [T, 1]
    one_sh = jnp.asarray(hc["one_sh"]).reshape(-1, 1)
    qmod = jnp.asarray(hc["qmod"])                    # [L, T]
    qmod_sh = jnp.asarray(hc["qmod_sh"])
    # digits broadcast against the target axis: [L, ..., 1, n] vs [T, 1]
    digs_t = digs[..., None, :]
    acc = w32.shoup_reduce32(digs_t[L - 1], ps, one_sh)  # [..., T, n]

    def step(acc, xs):
        j, dj = xs
        vj = w32.shoup_reduce32(dj, ps, one_sh)
        acc = w32.mod_add32(
            w32.shoup_mul32(acc, qmod[j].reshape(-1, 1),
                            qmod_sh[j].reshape(-1, 1), ps), vj, ps)
        return acc, None

    if L > 1:
        idx = jnp.arange(L - 2, -1, -1, dtype=jnp.uint32)
        acc, _ = jax.lax.scan(step, acc, (idx, digs_t[L - 2::-1]),
                              unroll=True)
    bigmod = jnp.asarray(hc["bigmod"]).reshape(-1, 1)
    return jnp.where(neg[..., None, :],
                     w32.mod_sub32(acc, bigmod, ps), acc)


def _extend_to_aux_general(params: NarrowParams, poly, res=None):
    """Exact centered base extension Q -> aux for ANY number of ct primes
    (Garner digits + per-aux Horner); the L=2 path keeps the fused u64
    compose.  Scan forms at L >= _SCAN_MIN_L keep the XLA program O(1)."""
    if res is None:
        res = to_coeff_residues32(params.ct_basis, poly)
    if len(params.moduli) >= _SCAN_MIN_L:
        digs, neg = _garner_digits_scan(params.moduli, res)
        ext = _horner_mod_all(params.moduli, digs, neg, params.aux_moduli)
        return from_coeff_residues32(params.aux_basis, ext)
    vs, neg = _garner_digits(params.moduli, res)
    outs = [_horner_mod(params.moduli, vs, neg, p)
            for p in params.aux_moduli]
    return from_coeff_residues32(params.aux_basis,
                                 jnp.stack(outs, axis=-2))


@lru_cache(maxsize=None)
def _hps_general_consts(moduli: tuple, aux_moduli: tuple, p: int):
    """Host constants for the general-L HPS scale (see
    `_narrow_hps_scale_general`)."""
    sh = w32.shoup_const32
    big_q = 1
    for m in moduli:
        big_q *= m
    big_p = 1
    for m in aux_moduli:
        big_p *= m
    # the round term r (|r| <= p/2) lifts through the smallest PREFIX of
    # aux primes whose product covers the centered range — one prime while
    # p < p_0 (the common case), a CRT pair for large t (e.g. the d=4
    # u64 profile's t = 2^35 over a 3-prime Q)
    n_lift, lift_prod = 0, 1
    while lift_prod <= p + 1:
        if n_lift == len(aux_moduli):
            raise InvalidParam("aux basis too small to lift the HPS round "
                               "term (need prod(aux) > plain modulus)")
        lift_prod *= aux_moduli[n_lift]
        n_lift += 1
    lift = aux_moduli[:n_lift]
    # mixed-radix digits of floor(lift_prod / 2) for the centered-sign
    # compare (least-significant digit first, like Garner's output)
    half, half_digits = lift_prod // 2, []
    for m in lift:
        half_digits.append(half % m)
        half //= m
    qinv_pj = tuple(hm.mod_inv(big_q % m, m) for m in aux_moduli)
    t_qi = tuple(p % m for m in moduli)
    t_pj = tuple(p % m for m in aux_moduli)
    pmodq = tuple(big_p % m for m in moduli)
    # Garner constants within the lift prefix: inv[j][i] = p_i^{-1} mod p_j
    lift_inv = tuple(tuple(hm.mod_inv(lift[i] % m, m) for i in range(j))
                     for j, m in enumerate(lift))
    lift_prod_qi = tuple(lift_prod % m for m in moduli)
    lift_pi_qi = tuple(tuple(lift[i] % m for i in range(n_lift))
                       for m in moduli)
    return {
        "qinv_pj": qinv_pj,
        "qinv_pj_sh": tuple(sh(v, m) for v, m in zip(qinv_pj, aux_moduli)),
        "t_qi": t_qi, "t_qi_sh": tuple(sh(v, m) for v, m in zip(t_qi, moduli)),
        "t_pj": t_pj,
        "t_pj_sh": tuple(sh(v, m) for v, m in zip(t_pj, aux_moduli)),
        "pmodq": pmodq,
        "n_lift": n_lift,
        "half_digits": tuple(half_digits),
        "lift_inv": lift_inv,
        "lift_inv_sh": tuple(tuple(sh(v, m) for v in row)
                             for row, m in zip(lift_inv, lift)),
        "lift_prod_qi": lift_prod_qi,
        "lift_prod_qi_sh": tuple(sh(v, m)
                                 for v, m in zip(lift_prod_qi, moduli)),
        "lift_pi_qi": lift_pi_qi,
        "lift_pi_qi_sh": tuple(tuple(sh(v, m) for v in row)
                               for row, m in zip(lift_pi_qi, moduli)),
    }


def _narrow_hps_scale_general(params: NarrowParams, t_q, t_p, eval_out=True):
    """round(t_plain * t / Q) mod q_i for ANY L ct primes, all-exact narrow
    ops.  Split t = a + Q*m (a = centered t mod Q):

      round(t_plain*t/Q) = t_plain*m + r,   r = round(t_plain*a/Q)

    * a's Garner digits come from t_q directly; m = (t_p - a)*Q^{-1} mod p_j
      per aux prime, then Garner over the aux basis -> m mod q_i (|m| < P/2
      by the tensor-magnitude guard).
    * r is SMALL (|r| <= t_plain/2 < p_0), so it lifts exactly through the
      single aux prime p_0: r = (t_plain*a - rho)/Q with rho = centered
      (t_plain*a mod Q), whose Garner digits come from the per-prime
      residues t_plain*t_q_i.

    Replaces the u64-pair + 64x128 fixed-point path (valid only at L=2);
    reference role: hps_scale, /root/reference/src/bfv/eval.rs:257-413."""
    moduli, aux_moduli = params.moduli, params.aux_moduli
    t_plain = params.plain_modulus
    cst = _hps_general_consts(moduli, aux_moduli, t_plain)
    ctb, auxb = params.ct_basis, params.aux_basis
    res_q = to_coeff_residues32(ctb, t_q)
    res_p = to_coeff_residues32(auxb, t_p)

    L = len(moduli)
    A = len(aux_moduli)
    n_lift = cst["n_lift"]
    garner = (_garner_digits_scan if L >= _SCAN_MIN_L
              else _garner_digits_stacked)

    def arr(vals):
        return jnp.asarray(np.array(vals, dtype=np.uint32)).reshape(-1, 1)

    qv = ctb.q.reshape(-1, 1)
    pv = auxb.q.reshape(-1, 1)
    t_qi = arr(cst["t_qi"])
    t_qi_sh = arr(cst["t_qi_sh"])

    # digits of a = centered t mod Q, and of x_rho = [t_plain * a]_Q
    digs_a, neg_a = garner(moduli, res_q)
    rho_res = w32.shoup_mul32(res_q, t_qi, t_qi_sh, qv)
    digs_r, neg_r = garner(moduli, rho_res)

    # a at every aux prime, then m_j = (t_p_j - a) * Q^{-1} mod p_j
    a_ext = _horner_mod_all(moduli, digs_a, neg_a, aux_moduli)  # [.., A, n]
    qinv = arr(cst["qinv_pj"])
    qinv_sh = arr(cst["qinv_pj_sh"])
    m_res = w32.shoup_mul32(w32.mod_sub32(res_p, a_ext, pv), qinv, qinv_sh,
                            pv)

    # round term r = (t_plain * a - rho) * Q^{-1}, |r| <= t_plain/2, lifted
    # through the first n_lift aux primes (1 when t < p_0; a CRT pair for
    # large t, e.g. the d=4 u64 profile's t = 2^35)
    lift = aux_moduli[:n_lift]
    pl = pv[:n_lift]
    rho_l = _horner_mod_all(moduli, digs_r, neg_r, lift)  # [.., n_lift, n]
    ta_l = w32.shoup_mul32(a_ext[..., :n_lift, :],
                           arr(cst["t_pj"][:n_lift]),
                           arr(cst["t_pj_sh"][:n_lift]), pl)
    r_l = w32.shoup_mul32(w32.mod_sub32(ta_l, rho_l, pl),
                          qinv[:n_lift], qinv_sh[:n_lift], pl)
    # Garner digits of r within the lift prefix (LSD first; n_lift <= 3 so
    # unrolled is fine)
    vs_rl = []
    for j in range(n_lift):
        pj = lift[j]
        pjs = jnp.uint32(pj)
        one_sh = jnp.uint32(w32.mont_consts32(pj)["one_shoup"])
        x = r_l[..., j, :]
        for i in range(j):
            vi = w32.shoup_reduce32(vs_rl[i], pjs, one_sh)
            x = w32.mod_sub32(x, vi, pjs)
            x = w32.shoup_mul32(x, jnp.uint32(cst["lift_inv"][j][i]),
                                jnp.uint32(cst["lift_inv_sh"][j][i]), pjs)
        vs_rl.append(x)
    # centered sign: mixed-radix lexicographic compare vs floor(prod/2)
    r_neg = jnp.zeros_like(vs_rl[0], dtype=bool)
    for j in range(n_lift):
        hj = jnp.uint32(cst["half_digits"][j])
        r_neg = (vs_rl[j] > hj) | ((vs_rl[j] == hj) & r_neg)

    # m as integer via aux-basis Garner, assembled at every ct prime
    garner_a = (_garner_digits_scan if A >= _SCAN_MIN_L
                else _garner_digits_stacked)
    digs_m, neg_m = garner_a(aux_moduli, m_res)
    m_q = _horner_mod_all(aux_moduli, digs_m, neg_m, moduli)  # [.., L, n]
    pm = w32.shoup_mul32(m_q, t_qi, t_qi_sh, qv)
    # r mod q_i for all i at once: Horner over the lift digits (MSD first),
    # minus prod when centered-negative
    one_sh_q = arr([w32.mont_consts32(m)["one_shoup"] for m in moduli])
    r_qi = w32.shoup_reduce32(vs_rl[n_lift - 1][..., None, :], qv, one_sh_q)
    for j in range(n_lift - 2, -1, -1):
        vj = w32.shoup_reduce32(vs_rl[j][..., None, :], qv, one_sh_q)
        r_qi = w32.mod_add32(
            w32.shoup_mul32(
                r_qi, arr([cst["lift_pi_qi"][i][j] for i in range(L)]),
                arr([cst["lift_pi_qi_sh"][i][j] for i in range(L)]), qv),
            vj, qv)
    r_signed = jnp.where(r_neg[..., None, :],
                         w32.mod_sub32(r_qi, arr(cst["lift_prod_qi"]), qv),
                         r_qi)
    out = w32.mod_add32(r_signed, pm, qv)
    if not eval_out:
        return out
    return from_coeff_residues32(ctb, out)


def _extend_to_aux(params: NarrowParams, poly, res=None):
    """EXACT centered base extension Q -> aux primes for a narrow poly.

    `res` (standard-form coefficient residues, e.g. a ciphertext's coeff
    shadow) skips the INTT."""
    if len(params.moduli) != 2:
        return _extend_to_aux_general(params, poly, res=res)
    if res is None:
        res = to_coeff_residues32(params.ct_basis, poly)
    from .ops import ntt_pallas32 as npal

    if _config.pallas_extend_enabled() and npal.supported(params.ring_degree):
        return npal.extend3_ntt_fused(
            res, params.moduli, params.aux_moduli,
            interpret=jax.default_backend() != "tpu",
            tables=npal.stage_tables_from_basis(params.aux_basis, "fwd"))
    x = _compose_pair(params, res)  # u64 pair in [0, Q)
    cst = _narrow_hps_consts(params.moduli, params.aux_moduli,
                             params.plain_modulus)
    qp = w.const_pair(cst["big_q"])
    half = w.const_pair(cst["big_q"] // 2)
    neg = w.gt64(x, half)
    mag = w.select64(neg, w.sub64(qp, x), x)
    auxb = params.aux_basis
    q = auxb.q.reshape(-1, 1)
    red = auxb.reduce64(mag[0][..., None, :], mag[1][..., None, :])
    out = jnp.where(neg[..., None, :], w32.mod_neg32(red, q), red)
    return from_coeff_residues32(auxb, out)


def _narrow_hps_scale(params: NarrowParams, t_q, t_p, eval_out=True):
    """round(p * t / Q) mod q_i from (t mod Q, t mod P); all-exact glue.

    eval_out=False returns standard-form coefficient residues (skips the
    output NTT — used for the c2 component, which feeds straight into the
    coefficient-domain gadget decomposition)."""
    if len(params.moduli) != 2:
        return _narrow_hps_scale_general(params, t_q, t_p, eval_out=eval_out)
    from .ops import ntt_pallas32 as npal

    if (_config.pallas_hps_enabled() and npal.supported(params.ring_degree)
            and len(params.moduli) == 2):
        ctb_, auxb_ = params.ct_basis, params.aux_basis
        return npal.hps_ntt_fused(
            t_q, t_p, params.moduli, params.aux_moduli,
            params.plain_modulus, eval_out=eval_out,
            interpret=jax.default_backend() != "tpu",
            tables=(*npal.stage_tables_from_basis(ctb_, "fwd"),
                    *npal.stage_tables_from_basis(ctb_, "inv"),
                    *npal.stage_tables_from_basis(auxb_, "inv")))
    cst = _narrow_hps_consts(params.moduli, params.aux_moduli,
                             params.plain_modulus)
    ctb, auxb = params.ct_basis, params.aux_basis
    res_q = to_coeff_residues32(ctb, t_q)
    res_p = to_coeff_residues32(auxb, t_p)

    a = _compose_pair(params, res_q)  # u64 pair, exact t mod Q
    qp = w.const_pair(cst["big_q"])
    half_q = w.const_pair(cst["big_q"] // 2)
    neg_a = w.gt64(a, half_q)
    mag = w.select64(neg_a, w.sub64(qp, a), a)

    # m_j = (t_p - a mod p_j) * Q^{-1} mod p_j  (narrow ops per aux prime)
    q_aux = auxb.q.reshape(-1, 1)
    magred = auxb.reduce64(mag[0][..., None, :], mag[1][..., None, :])
    a_ext = jnp.where(neg_a[..., None, :], w32.mod_neg32(magred, q_aux), magred)
    diff = w32.mod_sub32(res_p, a_ext, q_aux)
    qinv_pj = jnp.asarray(np.array(cst["qinv_pj"], dtype=np.uint32))[:, None]
    qinv_pj_sh = jnp.asarray(np.array(cst["qinv_pj_sh"],
                                      dtype=np.uint32))[:, None]
    m_j = w32.shoup_mul32(diff, qinv_pj, qinv_pj_sh, q_aux)  # standard form

    # Garner mixed-radix reconstruction of m over the aux primes — all
    # single-u32 narrow ops (no wide accumulator): digits v_j < p_j with
    # m = v_0 + p_0 (v_1 + p_1 (v_2 + ...)).
    A = len(params.aux_moduli)
    vs = []
    for j, pj in enumerate(params.aux_moduli):
        cc = w32.mont_consts32(pj)
        pjs = jnp.uint32(pj)
        one_sh = jnp.uint32(cc["one_shoup"])
        x = m_j[..., j, :]
        for i in range(j):
            # reduce v_i (< p_i, possibly >= p_j) mod p_j, then Garner step
            vi = w32.shoup_reduce32(vs[i], pjs, one_sh)
            x = w32.mod_sub32(x, vi, pjs)
            x = w32.shoup_mul32(x, jnp.uint32(cst["garner_inv"][j][i]),
                                jnp.uint32(cst["garner_inv_sh"][j][i]), pjs)
        vs.append(x)
    # sign of m (centered mod P): lexicographic mixed-radix compare vs P/2
    neg_m = jnp.zeros_like(vs[0], dtype=bool)
    for j in range(A):
        hj = jnp.uint32(cst["half_digits"][j])
        neg_m = (vs[j] > hj) | ((vs[j] == hj) & neg_m)

    # round term r = round(p * mag / Q) via 64x128 fixed point (exact)
    phi_words = tuple(jnp.uint32((cst["phi"] >> (32 * i)) & 0xFFFFFFFF)
                      for i in range(4))
    prod = w.mul64x128(mag, phi_words)
    w3 = prod[3] + jnp.uint32(1 << 29)
    c3 = (w3 < prod[3]).astype(jnp.uint32)
    w4 = prod[4] + c3
    c4 = (w4 < prod[4]).astype(jnp.uint32)
    w5 = prod[5] + c4
    r = ((w3 >> 30) | (w4 << 2), (w4 >> 30) | (w5 << 2))  # u64 pair < p

    # assemble result mod each ct prime (narrow): Horner over the
    # mixed-radix digits, m mod q_i = v_0 + p_0 (v_1 + p_1 v_2 + ...)
    outs = []
    for i, m in enumerate(params.moduli):
        cc = w32.mont_consts32(m)
        qs = jnp.uint32(m)
        r1s = jnp.uint32(cc["r1"])
        r1sh = jnp.uint32(cc["r1_shoup"])
        one_sh = jnp.uint32(cc["one_shoup"])
        m_mod = w32.shoup_reduce32(vs[A - 1], qs, one_sh)  # reduce mod q_i
        for j in range(A - 2, -1, -1):
            vj = w32.shoup_reduce32(vs[j], qs, one_sh)
            m_mod = w32.mod_add32(
                w32.shoup_mul32(m_mod, jnp.uint32(cst["pj_qi"][i][j]),
                                jnp.uint32(cst["pj_qi_sh"][i][j]), qs),
                vj, qs)
        m_mod = jnp.where(neg_m,
                          w32.mod_sub32(m_mod, jnp.uint32(cst["pmodq"][i]), qs),
                          m_mod)
        pm = w32.shoup_mul32(m_mod, jnp.uint32(cst["p_qi"][i]),
                             jnp.uint32(cst["p_qi_sh"][i]), qs)
        r_mod = w32.reduce_u64_shoup32(r[0], r[1], qs, r1s, r1sh, one_sh)
        r_signed = jnp.where(neg_a, w32.mod_neg32(r_mod, qs), r_mod)
        outs.append(w32.mod_add32(r_signed, pm, qs))
    out = jnp.stack(outs, axis=-2)
    if not eval_out:
        return out
    return from_coeff_residues32(ctb, out)


def _gadget_digits32(params: NarrowParams, poly, res=None):
    """Balanced power-of-two gadget digits of a narrow poly -> [.., D, L, n].

    `res` (standard-form coefficient residues) skips the input INTT."""
    if res is None:
        res = to_coeff_residues32(params.ct_basis, poly)
    x = _compose_pair(params, res)
    B = params.gadget_base
    D = params.gadget_digits
    logB = B.bit_length() - 1
    half_b = B // 2
    big_q = params.big_q
    qp = w.const_pair(big_q)
    neg = w.gt64(x, w.const_pair(big_q // 2))
    mag = w.select64(neg, w.sub64(qp, x), x)

    raw = [w.shr64(mag, i * logB)[0] & (B - 1) for i in range(D)]
    signs, mags = [], []
    carry = jnp.zeros_like(raw[0])
    for i in range(D):
        v = raw[i] + carry
        ge = v >= half_b
        mags.append(jnp.where(ge, B - v, v).astype(jnp.uint32))
        signs.append(ge)
        carry = ge.astype(jnp.uint32)

    basis = params.ct_basis
    q = basis.q.reshape(-1, 1)
    outs = []
    for i in range(D):
        fneg = (signs[i] ^ neg)[..., None, :]
        dmag = mags[i][..., None, :]
        val = jnp.where(fneg & (dmag != 0), q - dmag, dmag).astype(jnp.uint32)
        outs.append(val)
    digits = jnp.stack(outs, axis=-3)  # [.., D, L, n]
    return from_coeff_residues32(basis, digits)


@lru_cache(maxsize=None)
def _rns_gadget_consts(moduli: tuple):
    """gamma_i = (Q/q_i)^{-1} mod q_i (the CRT-digit extractors) and the
    gadget values g_i = Q/q_i mod q_j."""
    sh = w32.shoup_const32
    big = 1
    for m in moduli:
        big *= m
    gamma = tuple(hm.mod_inv((big // m) % m, m) for m in moduli)
    gmod = tuple(tuple((big // mi) % mj for mj in moduli) for mi in moduli)
    return {"gamma": gamma,
            "gamma_sh": tuple(sh(g, m) for g, m in zip(gamma, moduli)),
            "gmod": gmod, "big": big}


def _rns_digits32(params: NarrowParams, poly, res=None):
    """CRT-digit decomposition -> [.., D=L, L, n] eval-Montgomery digits.

    Digit i is the CENTERED per-prime value d_i = [x * gamma_i]_{q_i}
    (|d_i| <= q_i/2), spread across all L primes; sum_i d_i * (Q/q_i) == x
    (mod Q).  One Shoup product per digit — no CRT composition at all, the
    reason every large-L RNS library key-switches this way.  Reference role:
    gadget_decompose, /root/reference/src/bfv/keyswitch.rs:11-52."""
    basis = params.ct_basis
    moduli = params.moduli
    if res is None:
        res = to_coeff_residues32(basis, poly)
    cst = _rns_gadget_consts(moduli)
    q = basis.q.reshape(-1, 1)  # [L, 1]
    gamma = jnp.asarray(np.array(cst["gamma"], dtype=np.uint32))[:, None]
    gamma_sh = jnp.asarray(np.array(cst["gamma_sh"],
                                    dtype=np.uint32))[:, None]
    wi = w32.shoup_mul32(res, gamma, gamma_sh, q)        # [..., L, n]
    neg = wi > q // jnp.uint32(2)
    mag = jnp.where(neg, q - wi, wi)
    # spread each centered digit across all L primes: digit axis -3,
    # target-prime axis -2 (one broadcast instead of an L^2 unrolled loop)
    one_sh = jnp.asarray(np.array(
        [w32.mont_consts32(m)["one_shoup"] for m in moduli],
        dtype=np.uint32))[:, None]
    m = w32.shoup_reduce32(mag[..., :, None, :], q, one_sh)
    digits = jnp.where(neg[..., :, None, :] & (m != 0), q - m, m)
    return from_coeff_residues32(basis, digits)


def _gadget_matrix(params: NarrowParams) -> np.ndarray:
    """Montgomery-form gadget values [D, L] for keyswitch-key generation:
    base mode g_i = B^i mod q_j; rns mode g_i = Q/q_i mod q_j."""
    basis = params.ct_basis
    if params.gadget_mode == "rns":
        gmod = _rns_gadget_consts(params.moduli)["gmod"]
        g = np.array([[gmod[i][j] * (1 << 32) % m
                       for j, m in enumerate(basis.moduli)]
                      for i in range(len(params.moduli))], dtype=np.uint64)
    else:
        g = np.array([[pow(params.gadget_base, i, m) * (1 << 32) % m
                       for m in basis.moduli]
                      for i in range(params.gadget_digits)], dtype=np.uint64)
    return g.astype(np.uint32)


def _keyswitch_dot32(params: NarrowParams, poly, k0, k1, res=None):
    """Gadget keyswitch inner product (sum_i d_i*k0_i, sum_i d_i*k1_i) for
    the balanced digits of `poly` (eval domain; pass `res` = its standard
    coefficient residues to skip the INTT).  Routes through the fused
    Pallas kernel (digit extraction + per-digit NTT + Montgomery dot in
    VMEM) on TPU.  Reference: relinearize/key-switch inner product,
    /root/reference/src/bfv/keyswitch.rs:59-101."""
    basis = params.ct_basis
    from .ops import ntt_pallas32 as npal

    if (params.gadget_mode == "base"
            and _config.pallas_relin_enabled()
            and npal.supported(params.ring_degree)
            and (params.gadget_base & (params.gadget_base - 1)) == 0):
        if res is None:
            res = to_coeff_residues32(basis, poly)
        return npal.relin_dot_fused(
            res, k0, k1, params.moduli, params.gadget_base,
            params.gadget_digits, interpret=jax.default_backend() != "tpu",
            tables=npal.stage_tables_from_basis(basis, "fwd"))
    if params.gadget_mode == "rns":
        digits = _rns_digits32(params, poly, res=res)
    else:
        digits = _gadget_digits32(params, poly, res=res)
    q, qi = basis.b1()
    prod0 = w32.mont_mul32(digits, k0, q, qi)  # [.., D, L, n]
    prod1 = w32.mont_mul32(digits, k1, q, qi)
    D = params.gadget_digits
    acc0 = prod0[..., 0, :, :]
    acc1 = prod1[..., 0, :, :]
    for i in range(1, D):
        acc0 = w32.mod_add32(acc0, prod0[..., i, :, :], q)
        acc1 = w32.mod_add32(acc1, prod1[..., i, :, :], q)
    return acc0, acc1


def relinearize32(ct: NarrowCiphertext, rlk: NarrowRelinKey,
                  c2_res=None) -> NarrowCiphertext:
    if ct.c2 is None and c2_res is None:
        return ct
    params = ct.params
    basis = params.ct_basis
    acc0, acc1 = _keyswitch_dot32(params, ct.c2, rlk.rlk0, rlk.rlk1,
                                  res=c2_res)
    return NarrowCiphertext(c0=np_add(basis, ct.c0, acc0),
                            c1=np_add(basis, ct.c1, acc1),
                            c2=None, params=params)


# ---------------------------------------------------------------------------
# single-ciphertext BFV ops (building blocks for the narrow bootstrap)
# ---------------------------------------------------------------------------

def ct_add(ct1: NarrowCiphertext, ct2: NarrowCiphertext) -> NarrowCiphertext:
    basis = ct1.params.ct_basis
    return NarrowCiphertext(
        c0=np_add(basis, ct1.c0, ct2.c0), c1=np_add(basis, ct1.c1, ct2.c1),
        c0c=_zip_shadow(np_add, basis, ct1.c0c, ct2.c0c),
        c1c=_zip_shadow(np_add, basis, ct1.c1c, ct2.c1c),
        params=ct1.params)


def ct_sub(ct1: NarrowCiphertext, ct2: NarrowCiphertext) -> NarrowCiphertext:
    basis = ct1.params.ct_basis
    return NarrowCiphertext(
        c0=np_sub(basis, ct1.c0, ct2.c0), c1=np_sub(basis, ct1.c1, ct2.c1),
        c0c=_zip_shadow(np_sub, basis, ct1.c0c, ct2.c0c),
        c1c=_zip_shadow(np_sub, basis, ct1.c1c, ct2.c1c),
        params=ct1.params)


def ct_neg(ct: NarrowCiphertext) -> NarrowCiphertext:
    basis = ct.params.ct_basis
    z = lambda c: None if c is None else np_neg(basis, c)
    return NarrowCiphertext(c0=np_neg(basis, ct.c0), c1=np_neg(basis, ct.c1),
                            c0c=z(ct.c0c), c1c=z(ct.c1c), params=ct.params)


def ct_scalar_mul(ct: NarrowCiphertext, scalar: int) -> NarrowCiphertext:
    """ct * integer scalar (mod t); pure per-prime Shoup scalar multiply."""
    params = ct.params
    f = lambda c: None if c is None else _scalar_mul_ct(params, c, scalar)
    return NarrowCiphertext(c0=f(ct.c0), c1=f(ct.c1),
                            c0c=f(ct.c0c), c1c=f(ct.c1c), params=params)


def trivial_encrypt(coeffs_u64: np.ndarray, params: NarrowParams,
                    delta_scale=True) -> NarrowCiphertext:
    """Noiseless (Delta*m, 0) — reference trivial_encrypt,
    /root/reference/src/bootstrap/digit_extract.rs:161-189."""
    basis = params.ct_basis
    lo, hi = w.to_pair_np(np.asarray(coeffs_u64, dtype=np.uint64))
    m_poly = from_u64_coeffs32(basis, jnp.asarray(lo), jnp.asarray(hi))
    if delta_scale:
        q, qi = basis.b1()
        m_poly = w32.mont_mul32(m_poly, params.delta_mont[:, None], q, qi)
    return NarrowCiphertext(c0=m_poly, c1=jnp.zeros_like(m_poly),
                            params=params)


def bfv_mul32(ct1: NarrowCiphertext, ct2: NarrowCiphertext,
              rlk: NarrowRelinKey) -> NarrowCiphertext:
    """Single-ciphertext BFV multiply + relinearize over the narrow basis
    (any L): dual-basis Karatsuba tensor product, exact HPS scale, gadget
    keyswitch.  The workhorse of the bootstrap's digit-extraction squarings.
    Reference: bfv_mul_and_relin, /root/reference/src/bfv/eval.rs:73-108."""
    bp = ct1.params
    ctb, auxb = bp.ct_basis, bp.aux_basis
    qc = ctb.q.reshape(-1, 1)
    qa = auxb.q.reshape(-1, 1)
    e10 = _extend_to_aux(bp, ct1.c0, res=ct1.c0c)
    e11 = _extend_to_aux(bp, ct1.c1, res=ct1.c1c)
    e20 = _extend_to_aux(bp, ct2.c0, res=ct2.c0c)
    e21 = _extend_to_aux(bp, ct2.c1, res=ct2.c1c)

    def tensor(basis, q, a0, a1, b0, b1):
        t0 = np_mul(basis, a0, b0)
        t2 = np_mul(basis, a1, b1)
        tm = np_mul(basis, w32.mod_add32(a0, a1, q),
                    w32.mod_add32(b0, b1, q))
        t1 = w32.mod_sub32(w32.mod_sub32(tm, t0, q), t2, q)
        return t0, t1, t2

    tq = tensor(ctb, qc, ct1.c0, ct1.c1, ct2.c0, ct2.c1)
    tp = tensor(auxb, qa, e10, e11, e20, e21)
    r0 = _narrow_hps_scale(bp, tq[0], tp[0])
    r1 = _narrow_hps_scale(bp, tq[1], tp[1])
    r2_res = _narrow_hps_scale(bp, tq[2], tp[2], eval_out=False)
    return relinearize32(NarrowCiphertext(c0=r0, c1=r1, params=bp), rlk,
                         c2_res=r2_res)


# ---------------------------------------------------------------------------
# narrow dBFV
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class NarrowDbfvCiphertext:
    """dBFV ciphertext with the digit-limb axis LEADING: c0/c1 are
    [d, *batch, L, n].  A leading limb axis keeps each limb a contiguous
    slab, which the fused tensor-product kernel (ops/limbconv_pallas)
    depends on — limb slices along the sublane axis lower to per-vreg
    shuffles and measured 4.6x slower."""

    limbs: NarrowCiphertext = None  # limb axis at 0 of c0/c1
    mul_depth: int = flax.struct.field(pytree_node=False, default=0)
    params: NarrowDbfvParams = None


def _digit_polys(values, params: NarrowDbfvParams) -> np.ndarray:
    """Host decompose: values [*batch] u64 -> [d, *batch, n] digit polys."""
    from .dbfv.decomposition import digit_decompose

    d = params.num_digits
    n = params.bfv.ring_degree
    arr = np.asarray(values, dtype=np.uint64)
    out = np.zeros((d,) + arr.shape + (n,), dtype=np.uint64)
    flat = arr.reshape(-1)
    o = out.reshape(d, -1, n)
    mod = params.effective_plain_modulus
    for idx, v in enumerate(flat):
        for i, dig in enumerate(digit_decompose(int(v) % mod, params.base, d)):
            o[i, idx, 0] = dig
    return out


def dbfv_encrypt_sk(key, values, sk: NarrowSecretKey,
                    params: NarrowDbfvParams) -> NarrowDbfvCiphertext:
    limbs = encrypt_sk(key, _digit_polys(values, params), sk)
    return NarrowDbfvCiphertext(limbs=limbs, mul_depth=0, params=params)


def dbfv_decrypt(ct: NarrowDbfvCiphertext, sk: NarrowSecretKey):
    from .dbfv.decomposition import poly_digit_recompose_signed

    digits = decrypt(ct.limbs, sk)  # [d, *batch, n]
    const_terms = np.moveaxis(np.asarray(digits)[..., :1], 0, -2)
    vals = poly_digit_recompose_signed(const_terms, ct.params.base,
                                       ct.params.plain_modulus,
                                       ct.params.bfv.plain_modulus)[..., 0]
    return int(vals) if vals.ndim == 0 else vals


def _zip_shadow(op, basis, a, b):
    """Combine coeff shadows when both sides have them (mod ops are domain-
    agnostic, so the shadow of a+b is the sum of the shadows)."""
    if a is None or b is None:
        return None
    return op(basis, a, b)


def dbfv_add(ct1: NarrowDbfvCiphertext, ct2: NarrowDbfvCiphertext):
    basis = ct1.params.bfv.ct_basis
    return NarrowDbfvCiphertext(
        limbs=NarrowCiphertext(
            c0=np_add(basis, ct1.limbs.c0, ct2.limbs.c0),
            c1=np_add(basis, ct1.limbs.c1, ct2.limbs.c1),
            c0c=_zip_shadow(np_add, basis, ct1.limbs.c0c, ct2.limbs.c0c),
            c1c=_zip_shadow(np_add, basis, ct1.limbs.c1c, ct2.limbs.c1c),
            params=ct1.params.bfv),
        mul_depth=max(ct1.mul_depth, ct2.mul_depth), params=ct1.params)


def dbfv_sub(ct1: NarrowDbfvCiphertext, ct2: NarrowDbfvCiphertext):
    basis = ct1.params.bfv.ct_basis
    return NarrowDbfvCiphertext(
        limbs=NarrowCiphertext(
            c0=np_sub(basis, ct1.limbs.c0, ct2.limbs.c0),
            c1=np_sub(basis, ct1.limbs.c1, ct2.limbs.c1),
            c0c=_zip_shadow(np_sub, basis, ct1.limbs.c0c, ct2.limbs.c0c),
            c1c=_zip_shadow(np_sub, basis, ct1.limbs.c1c, ct2.limbs.c1c),
            params=ct1.params.bfv),
        mul_depth=max(ct1.mul_depth, ct2.mul_depth), params=ct1.params)


def dbfv_neg(ct: NarrowDbfvCiphertext):
    basis = ct.params.bfv.ct_basis
    return NarrowDbfvCiphertext(
        limbs=NarrowCiphertext(
            c0=np_neg(basis, ct.limbs.c0),
            c1=np_neg(basis, ct.limbs.c1),
            c0c=None if ct.limbs.c0c is None else np_neg(basis, ct.limbs.c0c),
            c1c=None if ct.limbs.c1c is None else np_neg(basis, ct.limbs.c1c),
            params=ct.params.bfv),
        mul_depth=ct.mul_depth, params=ct.params)


def plain_mul(ct: NarrowCiphertext, coeffs_u64: np.ndarray) -> NarrowCiphertext:
    """ct * raw plaintext polynomial (no Delta scaling)."""
    basis = ct.params.ct_basis
    lo, hi = w.to_pair_np(np.asarray(coeffs_u64, dtype=np.uint64))
    pt = from_u64_coeffs32(basis, jnp.asarray(lo), jnp.asarray(hi))
    return NarrowCiphertext(
        c0=np_mul(basis, ct.c0, pt), c1=np_mul(basis, ct.c1, pt),
        c2=None if ct.c2 is None else np_mul(basis, ct.c2, pt),
        params=ct.params)


def plain_add(ct: NarrowCiphertext, coeffs_u64: np.ndarray) -> NarrowCiphertext:
    """ct + Delta*m."""
    params = ct.params
    basis = params.ct_basis
    lo, hi = w.to_pair_np(np.asarray(coeffs_u64, dtype=np.uint64))
    m_poly = from_u64_coeffs32(basis, jnp.asarray(lo), jnp.asarray(hi))
    q, qi = basis.b1()
    delta_m = w32.mont_mul32(m_poly, params.delta_mont[:, None], q, qi)
    return NarrowCiphertext(c0=np_add(basis, ct.c0, delta_m), c1=ct.c1,
                            c2=ct.c2, c1c=ct.c1c, params=params)


# ---------------------------------------------------------------------------
# automorphisms (eval-domain gather, same orderings as the wide engine)
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class NarrowGaloisKey:
    ks0: jnp.ndarray = None  # [D, L, n]
    ks1: jnp.ndarray = None
    element: int = flax.struct.field(pytree_node=False, default=3)
    params: NarrowParams = None


def _auto_perm(n: int, k: int):
    from .ring.ntt import automorphism_perm

    return jnp.asarray(automorphism_perm(n, k % (2 * n)))


def gen_galois_key(key, sk: NarrowSecretKey, element: int) -> NarrowGaloisKey:
    params = sk.params
    basis = params.ct_basis
    D = params.gadget_digits
    perm = _auto_perm(params.ring_degree, element)
    s_auto = sk.poly[..., perm]
    k_a, k_e = jax.random.split(key)
    a = sample_uniform32(k_a, basis, (D,))
    e = from_signed32(basis, sample_gaussian_signed(
        k_e, params.sigma, (D, params.ring_degree)))
    g = jnp.asarray(_gadget_matrix(params))[..., None]
    q, qi = basis.b1()
    g_target = w32.mont_mul32(s_auto, g, q, qi)
    ks0 = np_add(basis, np_neg(basis, np_add(basis, np_mul(basis, a, sk.poly), e)),
                 g_target)
    return NarrowGaloisKey(ks0=ks0, ks1=a, element=int(element), params=params)


def apply_automorphism(ct: NarrowCiphertext, gk: NarrowGaloisKey) -> NarrowCiphertext:
    """sigma_k then key-switch back to s — eval-domain gather + narrow keyswitch."""
    params = ct.params
    basis = params.ct_basis
    perm = _auto_perm(params.ring_degree, gk.element)
    c0a = ct.c0[..., perm]
    c1a = ct.c1[..., perm]
    acc0, acc1 = _keyswitch_dot32(params, c1a, gk.ks0, gk.ks1)
    return NarrowCiphertext(c0=np_add(basis, c0a, acc0), c1=acc1, params=params)


def dbfv_apply_automorphism(ct: NarrowDbfvCiphertext,
                            gk: NarrowGaloisKey) -> NarrowDbfvCiphertext:
    return NarrowDbfvCiphertext(limbs=apply_automorphism(ct.limbs, gk),
                                mul_depth=ct.mul_depth, params=ct.params)


# ---------------------------------------------------------------------------
# advanced dBFV ops (narrow ports of dbfv/advanced.py, reference advanced.rs)
# ---------------------------------------------------------------------------

def _scalar_mul_ct(params: NarrowParams, c, scalar: int):
    """Multiply an eval-domain tensor by a scalar mod t (constant poly —
    a pure per-prime Shoup scalar multiply, no NTT needed)."""
    basis = params.ct_basis
    s = np.array([scalar % m for m in basis.moduli], dtype=np.uint32)
    ssh = np.array([w32.shoup_const32(scalar % m, m) for m in basis.moduli],
                   dtype=np.uint32)
    q = basis.q.reshape(-1, 1)
    return w32.shoup_mul32(c, jnp.asarray(s)[:, None],
                           jnp.asarray(ssh)[:, None], q)


def dbfv_div_by_base(ct: NarrowDbfvCiphertext) -> NarrowDbfvCiphertext:
    """phi_b: divide plaintext and modulus by b (reference advanced.rs:36-93).

    c(B) = c0 + B*c~(B) -> c0 * b^{-1} mod t folded into limb 1, limbs shift
    down; requires b | p.  Limb axis is 0 of c0/c1.
    """
    params = ct.params
    bp = params.bfv
    d = params.num_digits
    base = params.base
    t = bp.plain_modulus
    old_p = params.effective_plain_modulus
    if old_p % base != 0:
        raise InvalidParam(
            f"plaintext modulus {old_p} is not divisible by base {base}")
    new_p = old_p // base
    new_p = 0 if new_p == (1 << 64) else new_p
    binv = hm.mod_inv(base % t, t)

    def shift(c):
        c0_div = _scalar_mul_ct(bp, c[0], binv)
        limbs = []
        if d >= 2:
            limbs.append(w32.mod_add32(c[1], c0_div,
                                       bp.ct_basis.q.reshape(-1, 1)))
        else:
            limbs.append(c0_div)
        for i in range(1, d):
            limbs.append(c[i + 1] if i + 1 < d else jnp.zeros_like(c[0]))
        return jnp.stack(limbs, axis=0)

    new_params = NarrowDbfvParams(base=base, num_digits=d,
                                  plain_modulus=new_p, bfv=bp)
    # shift() is a form-agnostic mod-q linear map, so it applies to the
    # coefficient shadows unchanged
    sh = lambda c: None if c is None else shift(c)
    return NarrowDbfvCiphertext(
        limbs=NarrowCiphertext(c0=shift(ct.limbs.c0), c1=shift(ct.limbs.c1),
                               c0c=sh(ct.limbs.c0c), c1c=sh(ct.limbs.c1c),
                               params=bp),
        mul_depth=ct.mul_depth, params=new_params)


def dbfv_change_base(ct: NarrowDbfvCiphertext, new_base: int,
                     new_num_digits: int) -> NarrowDbfvCiphertext:
    """Linear change of base b -> b' (reference advanced.rs:99-160): new limb
    j = sum_i transform[j][i] * old limb i, transform column i = base-b'
    digits of b^i mod p — a static scalar linear map over the limb axis."""
    from .dbfv.decomposition import digit_decompose

    if new_base < 2:
        raise InvalidParam("new base must be >= 2")
    if new_num_digits < 1:
        raise InvalidParam("new_num_digits must be >= 1")
    params = ct.params
    bp = params.bfv
    old_d = params.num_digits
    p = params.effective_plain_modulus

    transform = [[0] * old_d for _ in range(new_num_digits)]
    b_pow = 1
    for i in range(old_d):
        digits = digit_decompose(b_pow % p, new_base, new_num_digits)
        for j in range(new_num_digits):
            transform[j][i] = digits[j]
        b_pow = (b_pow * params.base) % p

    q = bp.ct_basis.q.reshape(-1, 1)

    def apply(c):
        limbs = []
        for j in range(new_num_digits):
            acc = jnp.zeros_like(c[0])
            for i in range(old_d):
                coeff = transform[j][i]
                if coeff == 0:
                    continue
                acc = w32.mod_add32(
                    acc, _scalar_mul_ct(bp, c[i], coeff), q)
            limbs.append(acc)
        return jnp.stack(limbs, axis=0)

    new_params = NarrowDbfvParams(base=new_base, num_digits=new_num_digits,
                                  plain_modulus=params.plain_modulus, bfv=bp)
    ap = lambda c: None if c is None else apply(c)
    return NarrowDbfvCiphertext(
        limbs=NarrowCiphertext(c0=apply(ct.limbs.c0), c1=apply(ct.limbs.c1),
                               c0c=ap(ct.limbs.c0c), c1c=ap(ct.limbs.c1c),
                               params=bp),
        mul_depth=ct.mul_depth, params=new_params)


@lru_cache(maxsize=None)
def _limb_ntt_tables(moduli: tuple, dt: int):
    """Twiddle tables for the SECOND-LEVEL NTT over the digit axis (length
    dt = 2d), one per RNS prime.  Standard-form twiddles + Shoup companions
    so Montgomery-domain data stays Montgomery through the transform."""
    tabs = [w32.build_psi_tables32(m, dt) for m in moduli]
    u32a = lambda v: np.array(v, dtype=np.uint32)
    # NUMPY values only: this cache is shared across jit traces, and a jnp
    # array created inside one trace is a tracer that must not escape it
    return {
        "psi_std": np.stack([t["psi_std"] for t in tabs]),
        "psi_shoup": np.stack([t["psi_shoup"] for t in tabs]),
        "ipsi_std": np.stack([t["ipsi_std"] for t in tabs]),
        "ipsi_shoup": np.stack([t["ipsi_shoup"] for t in tabs]),
        "ninv_std": u32a([t["ninv_std"] for t in tabs]),
        "ninv_std_shoup": u32a([w32.shoup_const32(int(t["ninv_std"]), m)
                                for t, m in zip(tabs, moduli)]),
    }


def _tensor3_limb_ntt(basis, a0, a1, b0, b1, d, dout):
    """Degree-2 tensor product with the limb convolution evaluated by a
    second-level negacyclic NTT over the DIGIT axis.

    The limb convolution IS a polynomial multiply in the digit variable B
    (reference runs the d^2 products on rayon threads, dbfv/eval.rs:104-136;
    the round-2 engine used an unrolled Karatsuba tree).  At d = 64 the
    unrolled tree is 3^6 = 729 Montgomery products — a ~30k-op XLA program
    with pathological compile times — so instead: zero-pad the d limbs to
    dt = 2d, transform along the digit axis (linear conv degree 2d-2 < dt,
    so the negacyclic wrap never triggers and the transform is exact),
    multiply pointwise, transform back.  O(log d) program, ~3*(dt/2)log(dt)
    + dt multiplies vs Karatsuba's 3^log2(d) — more FLOPs at small d (the
    fused Pallas kernel keeps d <= 16), fewer from d = 64 up, and the
    program size no longer grows with d at all.  Works per RNS prime
    because dt | 2n | q-1 makes every narrow prime dt-NTT-friendly.

    Inputs [d, ..., L, n] eval-Montgomery; returns (t0, t1, t2) each
    [dout, ..., L, n] (dout = d truncates the p = b^d case)."""
    moduli = basis.moduli
    dt = 2 * d
    tabs = _limb_ntt_tables(moduli, dt)
    q, qinv = basis.q, basis.qinv
    qb, qib = q.reshape(-1, 1), qinv.reshape(-1, 1)

    def fwd(x):
        pad = jnp.zeros((dt - d,) + x.shape[1:], dtype=x.dtype)
        xp = jnp.concatenate([x, pad], axis=0)
        xt = jnp.swapaxes(jnp.moveaxis(xp, 0, -1), -2, -3)  # [.., n, L, dt]
        return w32.ntt_fwd32(xt, tabs["psi_std"], q, qinv,
                             psi_shoup=tabs["psi_shoup"])

    def inv(y):
        x = w32.ntt_inv32(y, tabs["ipsi_std"], tabs["ninv_std"], q, qinv,
                          ipsi_shoup=tabs["ipsi_shoup"],
                          ninv_shoup=tabs["ninv_std_shoup"])
        return jnp.moveaxis(jnp.swapaxes(x, -2, -3), -1, 0)[:dout]

    A0, A1, B0, B1 = fwd(a0), fwd(a1), fwd(b0), fwd(b1)
    T0 = w32.mont_mul32(A0, B0, qb, qib)
    T2 = w32.mont_mul32(A1, B1, qb, qib)
    TM = w32.mont_mul32(w32.mod_add32(A0, A1, qb),
                        w32.mod_add32(B0, B1, qb), qb, qib)
    T1 = w32.mod_sub32(w32.mod_sub32(TM, T0, qb), T2, qb)
    return inv(T0), inv(T1), inv(T2)


def _fold_eval(basis, x, reps, d):
    """Degree reduction IN THE EVAL DOMAIN: fold limbs j >= d of a
    [2d-1, ..., L, n] tensor (limb axis leading) back into the first d limbs
    with the SmallReps integer coefficients.  Valid on any RNS basis (the
    fold is an integer linear map over the limb axis, so it commutes with
    NTT, HPS scaling and relinearization); applying it BEFORE the HPS scale
    + relin cuts their limb count from 2d-1 to d and incurs one rounding
    error per output limb instead of |rep| of them (reference folds
    per-product post-scale, reduction.rs:15-60)."""
    q, qi = basis.b1()
    acc = [x[i] for i in range(d)]
    nlimbs = x.shape[0]
    for j in range(d, nlimbs):
        rep = reps[j - d]
        limb = x[j]
        for i in range(d):
            coeff = int(rep[i])
            if coeff == 0:
                continue
            s = np.array([coeff % m for m in basis.moduli], dtype=np.uint32)
            ssh = np.array([w32.shoup_const32(coeff % m, m)
                            for m in basis.moduli], dtype=np.uint32)
            scaled = w32.shoup_mul32(limb, jnp.asarray(s)[:, None],
                                     jnp.asarray(ssh)[:, None], q)
            acc[i] = w32.mod_add32(acc[i], scaled, q)
    return jnp.stack(acc, axis=0)


def _dbfv_mul_impl(ct1: NarrowDbfvCiphertext, ct2: NarrowDbfvCiphertext,
                   rlk: NarrowRelinKey, mesh=None,
                   limb_axis: str = "limb") -> NarrowDbfvCiphertext:
    params = ct1.params
    bp = params.bfv
    d = params.num_digits
    ctb, auxb = bp.ct_basis, bp.aux_basis

    c10, c11 = ct1.limbs.c0, ct1.limbs.c1
    c20, c21 = ct2.limbs.c0, ct2.limbs.c1
    # NOTE (round 4, measured): stacking the four extends (and the two
    # eval-out HPS calls) into single kernel launches REGRESSED the full
    # step 37 -> 45 ms at batch 256 — the jnp.stack materializes an extra
    # copy of every operand and serializes four independent kernels behind
    # one barrier, costing more than the saved launches.  Keep the four
    # independent calls.
    e10 = _extend_to_aux(bp, c10, res=ct1.limbs.c0c)
    e11 = _extend_to_aux(bp, c11, res=ct1.limbs.c1c)
    e20 = _extend_to_aux(bp, c20, res=ct2.limbs.c0c)
    e21 = _extend_to_aux(bp, c21, res=ct2.limbs.c1c)

    def kara(al, bl, q, qi):
        """Karatsuba limb convolution on python lists of eval-domain polys:
        3^log2(d) = 27 multiplies for d=8 instead of the schoolbook d^2 = 64
        (the adds/subs it trades them for are ~10x cheaper than a Montgomery
        multiply on the VPU)."""
        da = len(al)
        if da == 1 or da % 2 or len(bl) != da:
            out = [None] * (da + len(bl) - 1)
            for i, ai in enumerate(al):
                for j, bj in enumerate(bl):
                    t = w32.mont_mul32(ai, bj, q, qi)
                    out[i + j] = t if out[i + j] is None \
                        else w32.mod_add32(out[i + j], t, q)
            return out
        h = da // 2
        z0 = kara(al[:h], bl[:h], q, qi)
        z2 = kara(al[h:], bl[h:], q, qi)
        asum = [w32.mod_add32(x, y, q) for x, y in zip(al[:h], al[h:])]
        bsum = [w32.mod_add32(x, y, q) for x, y in zip(bl[:h], bl[h:])]
        z1 = kara(asum, bsum, q, qi)
        for i in range(len(z0)):
            z1[i] = w32.mod_sub32(z1[i], z0[i], q)
        for i in range(len(z2)):
            z1[i] = w32.mod_sub32(z1[i], z2[i], q)
        out = [None] * (2 * da - 1)
        for i, v in enumerate(z0):
            out[i] = v
        for i, v in enumerate(z1):
            j = i + h
            out[j] = v if out[j] is None else w32.mod_add32(out[j], v, q)
        for i, v in enumerate(z2):
            j = i + 2 * h
            out[j] = v if out[j] is None else w32.mod_add32(out[j], v, q)
        return out

    def conv_limbs(basis, a, b):
        """Limb-axis negacyclic-free convolution (anti-diagonal sums) via
        Karatsuba; the [d, d] product grid is never materialized.  Limb
        axis leading: a, b are [d, ..., L, n]."""
        q, qi = basis.b1()
        al = [a[i] for i in range(d)]
        bl = [b[i] for i in range(d)]
        return jnp.stack(kara(al, bl, q, qi), axis=0)

    def tensor3(basis, a0, a1, b0, b1):
        """Degree-2 tensor with the Karatsuba identity: t1 = (a0+a1)(b0+b1)
        - t0 - t2 — three limb convolutions instead of four."""
        q = basis.q.reshape(-1, 1)
        t0 = conv_limbs(basis, a0, b0)
        t2 = conv_limbs(basis, a1, b1)
        tm = conv_limbs(basis, w32.mod_add32(a0, a1, q),
                        w32.mod_add32(b0, b1, q))
        t1 = w32.mod_sub32(w32.mod_sub32(tm, t0, q), t2, q)
        return t0, t1, t2

    # degree reduction BEFORE the HPS scale: 2d-1 -> d limbs in eval domain
    # on both bases (see _fold_eval); the scale, relin and keyswitch then run
    # on d limbs instead of 2d-1.
    from .dbfv.lattice import SmallReps

    reps = SmallReps.compute_simple(params.base, d,
                                    params.plain_modulus).reps
    reps_t = tuple(tuple(int(c) for c in rep) for rep in reps)

    from .ops import limbconv_pallas as lcp

    all_zero_reps = all(all(int(c) == 0 for c in rep) for rep in reps)
    use_shardmap = (
        mesh is not None and limb_axis in getattr(mesh, "axis_names", ())
        and mesh.shape[limb_axis] > 1 and all_zero_reps
        and d % mesh.shape[limb_axis] == 0)
    if use_shardmap:
        # EXPLICIT-collective digit convolution: the limb axis is sharded on
        # mesh[limb_axis], each device all_gathers the counterparty limbs
        # over ICI and computes only its own anti-diagonal output limbs —
        # the shard_map replacement for the reference's rayon d^2 fan-out
        # (/root/reference/src/dbfv/eval.rs:104-136).  Local math is the jnp
        # Montgomery path (per-shard tensors are too small for the fused
        # kernels' batch tiles to pay off).
        from .parallel.shardmap_conv import tensor3_conv_shardmap

        tq = tensor3_conv_shardmap(c10, c11, c20, c21, ctb.moduli, mesh,
                                   limb_axis)
        tp = tensor3_conv_shardmap(e10, e11, e20, e21, auxb.moduli, mesh,
                                   limb_axis)
    elif d >= 32 and (d & (d - 1)) == 0:
        # large digit counts (the d=64 binary u64 profile): second-level
        # NTT over the digit axis — the unrolled Karatsuba tree would be
        # 3^log2(d) products with pathological XLA compile times
        dout = d if all_zero_reps else 2 * d - 1
        tq = _tensor3_limb_ntt(ctb, c10, c11, c20, c21, d, dout)
        tp = _tensor3_limb_ntt(auxb, e10, e11, e20, e21, d, dout)
        if dout != d:
            tq = tuple(_fold_eval(ctb, t, reps, d) for t in tq)
            tp = tuple(_fold_eval(auxb, t, reps, d) for t in tp)
    # d <= 16: beyond that the in-kernel Karatsuba tree (3^log2(d) unrolled
    # Montgomery products) overruns the VMEM live-set budget and Mosaic
    # compile times
    elif (_config.pallas_limbconv_enabled() and lcp.supported(bp.ring_degree)
            and d % 2 == 0 and d <= 16):
        interp = jax.default_backend() != "tpu"
        tq = lcp.tensor3_fused(c10, c11, c20, c21, ctb.moduli, reps=reps_t,
                               interpret=interp)
        tp = lcp.tensor3_fused(e10, e11, e20, e21, auxb.moduli, reps=reps_t,
                               interpret=interp)
        if tq[0].shape[0] != d:  # nonzero reps: fold outside the kernel
            tq = tuple(_fold_eval(ctb, t, reps, d) for t in tq)
            tp = tuple(_fold_eval(auxb, t, reps, d) for t in tp)
    else:
        tq = tensor3(ctb, c10, c11, c20, c21)
        tp = tensor3(auxb, e10, e11, e20, e21)
        tq = tuple(_fold_eval(ctb, t, reps, d) for t in tq)
        tp = tuple(_fold_eval(auxb, t, reps, d) for t in tp)

    r0 = _narrow_hps_scale(bp, tq[0], tp[0])
    r1 = _narrow_hps_scale(bp, tq[1], tp[1])
    # c2 stays in coefficient form: it feeds straight into the gadget
    # decomposition, skipping its output NTT and the gadget's input INTT.
    r2_res = _narrow_hps_scale(bp, tq[2], tp[2], eval_out=False)

    out = relinearize32(NarrowCiphertext(c0=r0, c1=r1, params=bp), rlk,
                        c2_res=r2_res)
    return NarrowDbfvCiphertext(limbs=out,
                                mul_depth=max(ct1.mul_depth, ct2.mul_depth) + 1,
                                params=params)


_dbfv_mul_jit32 = jax.jit(_dbfv_mul_impl,
                          static_argnames=("mesh", "limb_axis"))


def dbfv_mul(ct1: NarrowDbfvCiphertext, ct2: NarrowDbfvCiphertext,
             rlk: NarrowRelinKey, mesh=None,
             limb_axis: str = "limb") -> NarrowDbfvCiphertext:
    """Narrow-engine dBFV multiply (deferred-sum, all-narrow hot path).

    With `mesh` carrying a >1-sized `limb_axis` (and a p = b^d profile so
    degree reduction is pure truncation), the digit convolution runs as the
    explicit shard_map + all_gather program of
    parallel.shardmap_conv.tensor3_conv_shardmap; inputs should then be
    limb-sharded (parallel.shard_batch_limb)."""
    if max(ct1.mul_depth, ct2.mul_depth) + 1 > 1:
        from .errors import NotImplementedYet

        raise NotImplementedYet("chained dBFV multiplication requires bootstrap")
    bp = ct1.params.bfv
    # pre-scale degree reduction multiplies the tensor magnitude by the
    # actual SmallReps column sums (for p = b^d every rep is zero — B^j == 0
    # mod p — so the factor is 1, which admits large-base profiles like
    # d=4 / b=2^16 that the worst-case 1+(d-1)(b-1) bound would reject)
    from .dbfv.lattice import SmallReps

    d_ = ct1.params.num_digits
    reps_ = SmallReps.compute_simple(ct1.params.base, d_,
                                     ct1.params.plain_modulus).reps
    fold_factor = 1 + max(
        (sum(int(rep[i]) for rep in reps_) for i in range(d_)), default=0)
    if bp.aux_basis.modulus_product <= (fold_factor * ct1.params.num_digits
                                        * bp.ring_degree * bp.big_q // 2):
        raise InvalidParam("aux basis too small for deferred-sum scaling")
    fn = _dbfv_mul_jit32 if _config.jit_enabled() else _dbfv_mul_impl
    return fn(ct1, ct2, rlk, mesh=mesh, limb_axis=limb_axis)
