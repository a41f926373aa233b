"""RNS polynomial arithmetic: the device-resident workhorse type.

TPU-native counterpart of the reference's `RnsPoly`/`RnsBasis`
(/root/reference/src/ring/rns.rs): a polynomial over Z_Q[X]/(X^n+1) with
Q = prod q_i is held as one residue channel per prime, but here the channel
is a tensor axis (shape [..., L, n]) instead of a Vec of per-prime objects,
so every op is one batched kernel over all primes and all leading batch dims
at once — the RNS-limb axis and ciphertext-batch axes are exactly the axes a
device mesh shards.

Invariants
----------
* ``RnsPoly`` data is ALWAYS in NTT (evaluation) domain and Montgomery form.
  Coefficient-domain standard-form residues appear only transiently as raw
  (lo, hi) pairs between `to_coeff_residues` / `from_coeff_residues`.
* The evaluation order is the fixed bit-reversed order of
  :mod:`exacto_tpu.ring.ntt`; automorphisms act as index permutations here.
"""

from __future__ import annotations

from functools import lru_cache

import flax.struct
import jax.numpy as jnp
import numpy as np

from ..errors import InvalidParam, InvalidRingDegree, ModulusMismatch
from . import hostmath as hm
from . import ntt as nttmod
from . import wordops as w


def _pair_to_jnp(arr_u64: np.ndarray):
    lo, hi = w.to_pair_np(arr_u64)
    return jnp.asarray(lo), jnp.asarray(hi)


@flax.struct.dataclass
class RnsBasis:
    """Precomputed per-prime constants for an RNS basis (device resident).

    The analogue of the reference's RnsBasis precomputation
    (/root/reference/src/ring/rns.rs:21-63) plus the NTT plans
    (ntt.rs:19-29), all stacked over the prime axis L.
    """

    # static metadata (hashable; keys jit retracing)
    moduli: tuple = flax.struct.field(pytree_node=False)
    ring_degree: int = flax.struct.field(pytree_node=False)

    # (lo, hi) uint32 pairs
    q: tuple          # [L] moduli
    qinv: tuple       # [L] -q^{-1} mod 2^64
    r1: tuple         # [L] R mod q (Montgomery form of 1)
    r2: tuple         # [L] R^2 mod q
    ninv: tuple       # [L] n^{-1} in Montgomery form
    psi_rev: tuple    # [L, n] forward twiddles (Montgomery)
    ipsi_rev: tuple   # [L, n] inverse twiddles (Montgomery)
    psi_pows: tuple   # [L, 2n] psi^k in Montgomery form (monomial mul / debug)

    @classmethod
    def create(cls, moduli, ring_degree: int) -> "RnsBasis":
        moduli = tuple(int(m) for m in moduli)
        n = int(ring_degree)
        if n < 2 or n & (n - 1):
            raise InvalidRingDegree(n)
        if not moduli:
            raise InvalidParam("need at least one modulus")
        if len(set(moduli)) != len(moduli):
            raise InvalidParam("duplicate RNS moduli")
        for m in moduli:
            if m >= 1 << 62:
                raise InvalidParam(f"modulus {m} >= 2^62")
            if not hm.is_prime(m):
                raise InvalidParam(f"modulus {m} is not prime")
            if (m - 1) % (2 * n) != 0:
                raise InvalidParam(f"modulus {m} is not 1 mod 2n={2 * n}")

        R = 1 << 64
        qs = np.array(moduli, dtype=np.uint64)
        qinv = np.array([hm.montgomery_inv_neg(m) for m in moduli], dtype=np.uint64)
        r1 = np.array([hm.mont_r1(m) for m in moduli], dtype=np.uint64)
        r2 = np.array([hm.mont_r2(m) for m in moduli], dtype=np.uint64)
        psi_rev = np.zeros((len(moduli), n), dtype=np.uint64)
        ipsi_rev = np.zeros((len(moduli), n), dtype=np.uint64)
        ninv = np.zeros(len(moduli), dtype=np.uint64)
        psi_pows = np.zeros((len(moduli), 2 * n), dtype=np.uint64)
        for i, m in enumerate(moduli):
            tabs = nttmod.build_psi_tables(m, n)
            psi_rev[i] = tabs["psi_rev"]
            ipsi_rev[i] = tabs["ipsi_rev"]
            ninv[i] = tabs["ninv"]
            psi = hm.psi_2n(m, n)
            acc = 1
            for k in range(2 * n):
                psi_pows[i, k] = acc * R % m
                acc = acc * psi % m

        return cls(
            moduli=moduli,
            ring_degree=n,
            q=_pair_to_jnp(qs),
            qinv=_pair_to_jnp(qinv),
            r1=_pair_to_jnp(r1),
            r2=_pair_to_jnp(r2),
            ninv=_pair_to_jnp(ninv),
            psi_rev=_pair_to_jnp(psi_rev),
            ipsi_rev=_pair_to_jnp(ipsi_rev),
            psi_pows=_pair_to_jnp(psi_pows),
        )

    # -- broadcast helpers ------------------------------------------------
    def bq(self, extra: int = 1):
        return nttmod._b(self.q, extra)

    def bqinv(self, extra: int = 1):
        return nttmod._b(self.qinv, extra)

    def br1(self, extra: int = 1):
        return nttmod._b(self.r1, extra)

    def br2(self, extra: int = 1):
        return nttmod._b(self.r2, extra)

    @property
    def num_moduli(self) -> int:
        return len(self.moduli)

    @property
    def modulus_product(self) -> int:
        big = 1
        for m in self.moduli:
            big *= m
        return big

    def mont_scalar_pair(self, values) -> tuple:
        """Host ints (one per prime, or one shared) -> [L] Montgomery pair."""
        if isinstance(values, int):
            values = [values % m for m in self.moduli]
        arr = np.array([v * (1 << 64) % m for v, m in zip(values, self.moduli)],
                       dtype=object).astype(np.uint64)
        return _pair_to_jnp(arr)


@flax.struct.dataclass
class RnsPoly:
    """Polynomial in NTT domain, Montgomery form; (lo, hi) uint32 [..., L, n]."""

    lo: jnp.ndarray
    hi: jnp.ndarray

    @property
    def pair(self):
        return self.lo, self.hi

    @property
    def batch_shape(self):
        return self.lo.shape[:-2]


def _check(basis: RnsBasis, *polys: RnsPoly):
    for p in polys:
        if p.lo.shape[-1] != basis.ring_degree or p.lo.shape[-2] != basis.num_moduli:
            raise ModulusMismatch(
                f"poly shape {p.lo.shape} vs basis (L={basis.num_moduli}, n={basis.ring_degree})")


# ---------------------------------------------------------------------------
# arithmetic (NTT domain, Montgomery form)
# ---------------------------------------------------------------------------

def rp_zero(basis: RnsBasis, batch_shape=()) -> RnsPoly:
    shape = tuple(batch_shape) + (basis.num_moduli, basis.ring_degree)
    z = jnp.zeros(shape, dtype=jnp.uint32)
    return RnsPoly(lo=z, hi=z)


def rp_add(basis: RnsBasis, a: RnsPoly, b: RnsPoly) -> RnsPoly:
    q = basis.bq(1)
    lo, hi = w.mod_add64(a.pair, b.pair, q)
    return RnsPoly(lo=lo, hi=hi)


def rp_sub(basis: RnsBasis, a: RnsPoly, b: RnsPoly) -> RnsPoly:
    q = basis.bq(1)
    lo, hi = w.mod_sub64(a.pair, b.pair, q)
    return RnsPoly(lo=lo, hi=hi)


def rp_neg(basis: RnsBasis, a: RnsPoly) -> RnsPoly:
    q = basis.bq(1)
    lo, hi = w.mod_neg64(a.pair, q)
    return RnsPoly(lo=lo, hi=hi)


def rp_mul(basis: RnsBasis, a: RnsPoly, b: RnsPoly) -> RnsPoly:
    """Pointwise product in evaluation domain (= ring product)."""
    lo, hi = w.mont_mul(a.pair, b.pair, basis.bq(1), basis.bqinv(1))
    return RnsPoly(lo=lo, hi=hi)


def rp_scalar_mul(basis: RnsBasis, a: RnsPoly, scalar_mont: tuple) -> RnsPoly:
    """Multiply by per-prime scalars given as an [L] Montgomery pair."""
    s = nttmod._b(scalar_mont, 1)
    lo, hi = w.mont_mul(a.pair, s, basis.bq(1), basis.bqinv(1))
    return RnsPoly(lo=lo, hi=hi)


# ---------------------------------------------------------------------------
# domain conversions
# ---------------------------------------------------------------------------

def _use_fused_ntt(basis: RnsBasis) -> bool:
    import jax

    from .. import config as _config
    from ..ops import ntt_pallas as wpal

    return _config.pallas_ntt_enabled() and wpal.supported(basis.ring_degree)


def from_coeff_residues(basis: RnsBasis, residues) -> RnsPoly:
    """Standard-form residues [..., L, n] (u64 pair, < q_i) -> NTT-Montgomery."""
    if _use_fused_ntt(basis):
        import jax

        from ..ops import ntt_pallas as wpal

        lo, hi = wpal.ntt_fwd_fused(residues, basis.moduli, to_mont=True,
                                    interpret=jax.default_backend() != "tpu")
        return RnsPoly(lo=lo, hi=hi)
    mont = w.to_mont(residues, basis.bq(1), basis.bqinv(1), basis.br2(1))
    lo, hi = nttmod.ntt_fwd(mont, basis.psi_rev, basis.q, basis.qinv)
    return RnsPoly(lo=lo, hi=hi)


def to_coeff_residues(basis: RnsBasis, poly: RnsPoly):
    """NTT-Montgomery -> standard-form coefficient residues [..., L, n] pair."""
    _check(basis, poly)
    if _use_fused_ntt(basis):
        import jax

        from ..ops import ntt_pallas as wpal

        return wpal.ntt_inv_fused(poly.pair, basis.moduli, from_mont=True,
                                  interpret=jax.default_backend() != "tpu")
    raw = nttmod.ntt_inv(poly.pair, basis.ipsi_rev, basis.ninv, basis.q, basis.qinv)
    return w.from_mont(raw, basis.bq(1), basis.bqinv(1))


def from_signed_coeffs(basis: RnsBasis, v) -> RnsPoly:
    """Small signed int32 coefficients [..., n] -> RnsPoly (broadcast to L).

    Used for sampled noise/keys: v in roughly [-2^31, 2^31).
    """
    v = jnp.asarray(v, dtype=jnp.int32)[..., None, :]  # add L axis
    mag = jnp.abs(v).astype(jnp.uint32)
    neg = v < 0
    q = basis.bq(1)
    neg_lo, neg_hi = w.sub64(q, (mag, jnp.zeros_like(mag)))
    # value 0 must stay 0 even on the negative branch (|0| -> q - 0 = q invalid)
    lo = jnp.where(neg, neg_lo, mag)
    hi = jnp.where(neg, neg_hi, jnp.zeros_like(mag))
    return from_coeff_residues(basis, (lo, hi))


def from_u64_coeffs(basis: RnsBasis, pair) -> RnsPoly:
    """Arbitrary u64 coefficients [..., n] (lo, hi pair) -> RnsPoly."""
    lo = pair[0][..., None, :]
    hi = pair[1][..., None, :]
    red = w.mod_from_u64((lo, hi), basis.bq(1), basis.bqinv(1), basis.br1(1))
    return from_coeff_residues(basis, red)


def to_u64_host(basis: RnsBasis, poly: RnsPoly) -> np.ndarray:
    """Pull standard-form coefficient residues to host as uint64 [..., L, n]."""
    lo, hi = to_coeff_residues(basis, poly)
    return w.from_pair_np(np.asarray(lo), np.asarray(hi))


def from_host_residues(basis: RnsBasis, residues: np.ndarray) -> RnsPoly:
    """Host uint64 residues [..., L, n] (each < q_i) -> device RnsPoly."""
    pair = _pair_to_jnp(np.asarray(residues, dtype=np.uint64))
    return from_coeff_residues(basis, pair)


def crt_to_ints_host(basis: RnsBasis, residues: np.ndarray) -> np.ndarray:
    """Host CRT reconstruction: uint64 [..., L, n] -> object ndarray [..., n].

    BigInt CRT on host, the analogue of the reference decrypt's BigUint path
    (/root/reference/src/bfv/encrypt.rs:142-172).
    """
    residues = np.asarray(residues, dtype=np.uint64)
    L = basis.num_moduli
    big_q = basis.modulus_product
    crt_terms = []
    for m in basis.moduli:
        q_star = big_q // m
        crt_terms.append(q_star * hm.mod_inv(q_star % m, m))
    flat = residues.reshape(-1, L, basis.ring_degree)
    out = np.empty((flat.shape[0], basis.ring_degree), dtype=object)
    for b in range(flat.shape[0]):
        for j in range(basis.ring_degree):
            x = 0
            for i in range(L):
                x += crt_terms[i] * int(flat[b, i, j])
            out[b, j] = x % big_q
    return out.reshape(residues.shape[:-2] + (basis.ring_degree,))


# ---------------------------------------------------------------------------
# eval-domain structure ops
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _perm_device(n: int, k: int):
    return jnp.asarray(nttmod.automorphism_perm(n, k))


def rp_automorphism(basis: RnsBasis, poly: RnsPoly, k: int) -> RnsPoly:
    """sigma_k (X -> X^k) as a pure gather in the evaluation domain.

    The reference round-trips through coefficient domain
    (/root/reference/src/bfv/eval.rs:526-531); on TPU the eval-order
    permutation makes this a single gather with no NTTs.
    """
    perm = _perm_device(basis.ring_degree, k % (2 * basis.ring_degree))
    return RnsPoly(lo=poly.lo[..., perm], hi=poly.hi[..., perm])


@lru_cache(maxsize=None)
def _eval_exp_device(n: int):
    return jnp.asarray(np.array(nttmod.eval_exponents(n), dtype=np.int32))


def rp_monomial_mul(basis: RnsBasis, poly: RnsPoly, j) -> RnsPoly:
    """Multiply by the monomial X^j (j may be a traced scalar OR an array).

    In eval order, (X^j * a) at eval point psi^{e_i} is psi^{j*e_i} * a_i, so
    this is a gather from the precomputed psi-power table followed by a
    pointwise product — no NTTs (reference: eval.rs:613-652 permutes
    coefficients instead).  An array j of shape S produces leading batch axes
    S on the result (used by the batched CoeffsToSlots): all n coefficient
    extractions of the bootstrap shift in ONE op.
    """
    n = basis.ring_degree
    e = _eval_exp_device(n)  # [n] int32
    j = jnp.asarray(j, dtype=jnp.int32)
    idx = (j[..., None] * e) % (2 * n)  # [*S, n]; exact in int32 (< 2^26)
    s_lo = jnp.moveaxis(jnp.take(basis.psi_pows[0], idx, axis=1), 0, -2)
    s_hi = jnp.moveaxis(jnp.take(basis.psi_pows[1], idx, axis=1), 0, -2)
    # insert singleton axes so shift-batch dims S prepend (not collide with)
    # the poly's own batch dims
    S = idx.shape[:-1]
    extra = poly.lo.ndim - 2
    shape = S + (1,) * extra + s_lo.shape[-2:]
    s_lo = s_lo.reshape(shape)
    s_hi = s_hi.reshape(shape)
    lo, hi = w.mont_mul(poly.pair, (s_lo, s_hi), basis.bq(1), basis.bqinv(1))
    return RnsPoly(lo=lo, hi=hi)


def fast_base_extend(src_basis: RnsBasis, dst_basis: RnsBasis,
                     poly: RnsPoly) -> RnsPoly:
    """Approximate Bajard-style base extension src -> dst (reference
    rns.rs:226-282, implemented-but-unused there; same contract here).

    For x given mod A = prod a_i, computes x + u*A mod each dst prime with
    u in [0, k) (the classic approximate extension without the alpha
    correction).  The live HPS multiply uses the exact centered extension in
    bfv.eval instead; this is exported for API parity and for RNS-tool reuse.
    """
    from . import wordops as ww

    k = src_basis.num_moduli
    big_a = src_basis.modulus_product
    res = to_coeff_residues(src_basis, poly)  # [..., k, n] standard form

    # y_i = x_i * (A/a_i)^{-1} mod a_i
    inv_factors = src_basis.mont_scalar_pair(
        [hm.mod_inv((big_a // a) % a, a) for a in src_basis.moduli])
    y = ww.mont_mul(res, (inv_factors[0][:, None], inv_factors[1][:, None]),
                    src_basis.bq(1), src_basis.bqinv(1))

    # ext_j = sum_i y_i * (A/a_i mod b_j)  (mod b_j)
    outs_lo, outs_hi = [], []
    for j, b in enumerate(dst_basis.moduli):
        accum = None
        for i, a in enumerate(src_basis.moduli):
            coef = (big_a // a) % b
            cst = ww.const_pair(coef * (1 << 64) % b)
            yi = (y[0][..., i, :], y[1][..., i, :])
            term = ww.mont_mul(yi, cst, ww.const_pair(b),
                               ww.const_pair(hm.montgomery_inv_neg(b)))
            accum = term if accum is None else ww.mod_add64(
                accum, term, ww.const_pair(b))
        outs_lo.append(accum[0])
        outs_hi.append(accum[1])
    lo = jnp.stack(outs_lo, axis=-2)
    hi = jnp.stack(outs_hi, axis=-2)
    return from_coeff_residues(dst_basis, (lo, hi))


def rp_sum_leading_axis(basis: RnsBasis, poly: RnsPoly) -> RnsPoly:
    """Modular tree-sum over the leading batch axis: [B, ..., L, n] -> [..., L, n]."""
    q = basis.bq(1)
    lo, hi = poly.lo, poly.hi
    while lo.shape[0] > 1:
        k = lo.shape[0]
        half = k // 2
        a = (lo[:half], hi[:half])
        b = (lo[half:2 * half], hi[half:2 * half])
        s = w.mod_add64(a, b, q)
        if k % 2:
            lo = jnp.concatenate([s[0], lo[-1:]], axis=0)
            hi = jnp.concatenate([s[1], hi[-1:]], axis=0)
        else:
            lo, hi = s
    return RnsPoly(lo=lo[0], hi=hi[0])
