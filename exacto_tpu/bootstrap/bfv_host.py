"""BFV / dBFV bootstrapping host: modulus switch, phase re-encryption,
rounding-polynomial evaluation, and the dBFV chain helpers.

Reference: /root/reference/src/bootstrap/bfv_host.rs.  TPU-native changes:

* The per-coefficient rounding-poly evaluation runs ONCE on the slot-batched
  ciphertext from the batched CoeffsToSlots (the reference maps sequentially
  over n ciphertexts, bfv_host.rs:192-194).
* dBFV bootstrap refreshes all d limbs in one batched pass (the reference's
  rayon par_iter, bfv_host.rs:225-227).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..bfv import BfvCiphertext
from ..bfv.encoding import Plaintext
from ..bfv.encrypt import encrypt_sk
from ..bfv.eval import bfv_add, bfv_plain_mul
from ..bfv.keygen import RelinKey, SecretKey, gen_relin_key
from ..errors import InvalidParam
from ..params import BfvParams, DbfvParams
from ..ring import wordops as w
from ..ring.rns import from_host_residues, to_u64_host
from ..dbfv.ciphertext import DbfvCiphertext
from ..dbfv.eval import dbfv_mul
from .coeffs_to_slots import coeffs_to_slots, gen_trace_galois_keys, slots_to_coeffs
from .digit_extract import (
    compute_rounding_poly, eval_poly_homomorphic, trivial_encrypt_poly,
)


@dataclasses.dataclass
class BootstrapKey:
    """Encrypts s under the boot scheme; circular security
    (reference bfv_host.rs:23-38).

    DIVERGENCE: also records the original params — our bootstrap returns the
    refreshed ciphertext to the ORIGINAL scheme (see bfv_bootstrap), which is
    what makes repeated mul-then-bootstrap chains sound.
    """

    bsk: BfvCiphertext
    boot_params: BfvParams
    boot_rlk: RelinKey
    galois_keys: dict
    rounding_poly: list
    t_orig: int
    q_prime: int
    orig_params: BfvParams = None


def _sk_centered_coeffs(sk: SecretKey) -> list[int]:
    """Secret key coefficients as centered ints (ternary: {-1, 0, 1})."""
    basis = sk.params.ct_basis
    res = to_u64_host(basis, sk.poly)  # [L, n]
    q0 = basis.moduli[0]
    out = []
    for c in res[0]:
        c = int(c)
        out.append(c - q0 if c > q0 // 2 else c)
    return out


def create_boot_sk(sk: SecretKey, boot_params: BfvParams) -> SecretKey:
    """Same polynomial s under the boot basis (reference bfv_host.rs:292-325)."""
    coeffs = _sk_centered_coeffs(sk)
    res = np.zeros((len(boot_params.moduli), boot_params.ring_degree),
                   dtype=np.uint64)
    for li, m in enumerate(boot_params.moduli):
        res[li] = np.array([c % m for c in coeffs], dtype=np.uint64)
    poly = from_host_residues(boot_params.ct_basis, res)
    return SecretKey(poly=poly, params=boot_params)


def gen_bootstrap_key(key, sk: SecretKey, boot_params: BfvParams,
                      q_prime: int, t_orig: int) -> BootstrapKey:
    """Encrypt s under boot scheme + relin/Galois keys + rounding poly
    (reference bfv_host.rs:50-121)."""
    n = sk.params.ring_degree
    if boot_params.ring_degree != n:
        raise InvalidParam("boot params must have same ring degree")

    t_boot = boot_params.plain_modulus
    coeffs = _sk_centered_coeffs(sk)
    s_pt = Plaintext(
        coeffs=np.array([c % t_boot for c in coeffs], dtype=np.uint64),
        modulus=t_boot)

    boot_sk = create_boot_sk(sk, boot_params)
    k1, k2, k3 = jax.random.split(key, 3)
    bsk_ct = encrypt_sk(k1, s_pt, boot_sk)
    boot_rlk = gen_relin_key(k2, boot_sk)
    galois_keys = gen_trace_galois_keys(k3, boot_sk)
    rounding_poly = compute_rounding_poly(t_orig, q_prime, t_boot)

    return BootstrapKey(bsk=bsk_ct, boot_params=boot_params,
                        boot_rlk=boot_rlk, galois_keys=galois_keys,
                        rounding_poly=rounding_poly, t_orig=t_orig,
                        q_prime=q_prime, orig_params=sk.params)


def _modswitch_to_qprime(ct: BfvCiphertext, q_prime: int):
    """Scalar modulus switch Q -> q' with rounding, on host
    (reference bfv_host.rs:149-160).  Returns (c0', c1') uint64 [..., n].

    Handles multi-prime Q via exact CRT composition (the chain path
    re-bootstraps ciphertexts living under the multi-prime boot modulus).
    """
    from ..ring.rns import crt_to_ints_host

    params = ct.params
    basis = params.ct_basis
    q = params.big_q
    out = []
    for comp in ct.c[:2]:
        res = to_u64_host(basis, comp)  # [..., L, n]
        xs = crt_to_ints_host(basis, res)
        flat = xs.reshape(-1)
        switched = np.array(
            [((q_prime * int(v) + q // 2) // q) % q_prime for v in flat],
            dtype=np.uint64).reshape(xs.shape)
        out.append(switched)
    return out[0], out[1]


def bfv_bootstrap(ct: BfvCiphertext, bsk: BootstrapKey) -> BfvCiphertext:
    """Refresh noise (reference bfv_host.rs:134-204).

    1. modswitch q -> q'; 2. re-encrypt phase under boot scheme;
    3. trivial fast path, or batched CoeffsToSlots -> batched rounding-poly
    eval -> SlotsToCoeffs.
    """
    if len(ct.c) != 2:
        raise InvalidParam("bootstrap requires degree-1 ciphertext")
    boot_params = bsk.boot_params
    t_boot = boot_params.plain_modulus

    c0p, c1p = _modswitch_to_qprime(ct, bsk.q_prime)
    # DIVERGENCE (correctness fix): embed c0'/c1' CENTERED mod q' into
    # Z_{t_boot}, so the integer phase v = c0'c + c1'c * s stays small
    # (|v| ~ q'*sqrt(h)) and the centered rounding polynomial recovers
    # v mod q' exactly whenever |v| < t_boot/2.  The reference embeds the
    # raw [0, q') representatives (bfv_host.rs:164-172), whose phase is
    # frequently negative or > t_boot and then decodes wrongly.
    qp = bsk.q_prime

    def center_embed(x):
        c = x.astype(np.int64)
        c = np.where(c > qp // 2, c - qp, c)
        return (c % t_boot).astype(np.uint64)

    c0_pt = Plaintext(coeffs=center_embed(c0p), modulus=t_boot)
    c1_pt = Plaintext(coeffs=center_embed(c1p), modulus=t_boot)

    ct_c0 = trivial_encrypt_poly(c0_pt, boot_params)
    ct_c1s = bfv_plain_mul(bsk.bsk, c1_pt)
    ct_phase = bfv_add(ct_c0, ct_c1s)

    if not np.any(c1p):
        # trivial ciphertext fast path (c1 = 0)
        refreshed = eval_poly_homomorphic(ct_phase, bsk.rounding_poly, bsk.boot_rlk)
    else:
        slots = coeffs_to_slots(ct_phase, bsk.galois_keys)       # [n] batch
        rounded = eval_poly_homomorphic(slots, bsk.rounding_poly, bsk.boot_rlk)
        refreshed = slots_to_coeffs(rounded)
    return switch_to_scheme(refreshed, bsk.orig_params)


def switch_to_scheme(ct: BfvCiphertext, target: BfvParams) -> BfvCiphertext:
    """Pure modulus switch onto `target` params (c -> round(c * q_t / Q_s)).

    The source ciphertext must already carry its plaintext pre-scaled for the
    target plaintext modulus: the rounding polynomial outputs
    m~ = round(m * t_boot / t_orig), so phase (Q_s/t_s) * m~ ~= (Q_s/t_t) * m
    and the pure scale-by-q_t/Q_s yields a valid target-scheme encryption of
    m.  (A combined modulus+plain-modulus switch is unsound: Q_s-wraps of the
    integer phase would scale to non-multiples of q_t.)  Same secret s
    (circular security), so no key switch — only a basis change.  This is the
    step the reference lacks (its bootstrap output stays in the boot scheme,
    bfv_host.rs:212-236, which breaks a second bootstrap: the rounding
    polynomial is built for t_orig but the ciphertext then carries t_boot).
    """
    from ..ring.rns import crt_to_ints_host

    src = ct.params
    big_q = src.big_q
    num = target.big_q
    den = big_q
    comps = []
    for comp in ct.c:
        res = to_u64_host(src.ct_basis, comp)
        xs = crt_to_ints_host(src.ct_basis, res)
        flat = xs.reshape(-1)
        scaled = np.empty(flat.shape, dtype=object)
        for i, v in enumerate(flat):
            # centered scaling keeps the rounding error symmetric
            vv = int(v)
            if vv > big_q // 2:
                vv -= big_q
            s = (2 * num * vv + den) // (2 * den)  # round(num*v/den)
            scaled[i] = s % target.big_q
        scaled = scaled.reshape(xs.shape)
        outs = np.zeros(xs.shape[:-1] + (len(target.moduli), xs.shape[-1]),
                        dtype=np.uint64)
        flat_s = scaled.reshape(-1, xs.shape[-1])
        flat_o = outs.reshape(-1, len(target.moduli), xs.shape[-1])
        for b in range(flat_s.shape[0]):
            for li, m in enumerate(target.moduli):
                flat_o[b, li] = np.array([int(v) % m for v in flat_s[b]],
                                         dtype=np.uint64)
        comps.append(from_host_residues(target.ct_basis, outs))
    return BfvCiphertext(c=tuple(comps), params=target)


def dbfv_bootstrap(ct: DbfvCiphertext, bsk: BootstrapKey) -> DbfvCiphertext:
    """Refresh all limbs in one batched pass; resets mul_depth
    (reference bfv_host.rs:212-236).

    DIVERGENCE: the refreshed ciphertext lives under the ORIGINAL dBFV
    params (the reference swaps in the boot params, which breaks the next
    bootstrap's rounding polynomial — see switch_to_scheme).
    """
    refreshed_params = DbfvParams.create(bsk.orig_params, ct.params.base,
                                         ct.params.num_digits,
                                         ct.params.plain_modulus)
    # bootstrap limbs: the limb axis is a batch axis through the whole pipeline
    limbs = bfv_bootstrap(ct.limbs, bsk)
    return DbfvCiphertext(limbs=limbs, degree=ct.degree, mul_depth=0,
                          params=refreshed_params)


def dbfv_mul_then_bootstrap(ct1: DbfvCiphertext, ct2: DbfvCiphertext,
                            rlk: RelinKey, bsk: BootstrapKey) -> DbfvCiphertext:
    """Multiply then refresh — the supported way to chain multiplies
    (reference bfv_host.rs:242-250)."""
    return dbfv_bootstrap(dbfv_mul(ct1, ct2, rlk), bsk)


def dbfv_mul_chain_then_bootstrap(cts, rlk: RelinKey,
                                  bsk: BootstrapKey) -> DbfvCiphertext:
    """Fold a product chain with bootstrap refresh after each step
    (reference bfv_host.rs:258-288).

    Because our bootstrap returns ciphertexts to the original scheme, every
    step multiplies under the original relin key — the reference's
    params-juggling (boot-rlk selection, on-demand refresh of stale inputs)
    collapses away, except for inputs that genuinely arrived under foreign
    params, which are refreshed first.
    """
    if not cts:
        raise InvalidParam("dbfv_mul_chain_then_bootstrap requires at least one ciphertext")
    acc = cts[0]
    for ct in cts[1:]:
        acc_bp = acc.params.bfv_params
        rhs_bp = ct.params.bfv_params
        if (acc_bp.plain_modulus != rhs_bp.plain_modulus
                or acc_bp.ring_degree != rhs_bp.ring_degree
                or acc_bp.moduli != rhs_bp.moduli):
            rhs = dbfv_bootstrap(ct, bsk)
        else:
            rhs = ct
        acc = dbfv_mul_then_bootstrap(acc, rhs, rlk, bsk)
    return acc
