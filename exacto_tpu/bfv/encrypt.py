"""BFV encryption and decryption.

Reference: /root/reference/src/bfv/encrypt.rs.  Encryption is fully
device-side and batch-aware; decryption computes the phase on device and does
the CRT + round(p*x/Q) scaling on host with exact Python ints (the analogue
of the reference's BigUint path, encrypt.rs:142-172).  A device-side scaling
path for single-prime Q exists in :func:`decrypt_residues_device`-free form
later (bench path) — host is the verification oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as _config
from ..errors import InvalidParam
from ..params import BfvParams
from ..ring import wordops as w
from ..ring.rns import (
    RnsPoly, from_coeff_residues, rp_add, rp_mul, rp_neg, rp_scalar_mul,
    to_u64_host, crt_to_ints_host,
)
from ..sampling import (
    sample_binary_rns, sample_gaussian_rns, sample_uniform_rns,
)
from . import BfvCiphertext
from .encoding import Plaintext
from .keygen import PublicKey, SecretKey


def _plaintext_pair(plaintext: Plaintext, params: BfvParams):
    """Host-side u64 -> (lo, hi) uint32 split of the plaintext coefficients."""
    coeffs = np.asarray(plaintext.coeffs, dtype=np.uint64)
    if coeffs.shape[-1] != params.ring_degree:
        raise InvalidParam(
            f"plaintext degree {coeffs.shape[-1]} != n={params.ring_degree}")
    lo, hi = w.to_pair_np(coeffs)
    return jnp.asarray(lo), jnp.asarray(hi)


def _scale_core(pair, params: BfvParams) -> RnsPoly:
    basis = params.ct_basis
    p = (pair[0][..., None, :], pair[1][..., None, :])
    red = w.mod_from_u64(p, basis.bq(1), basis.bqinv(1), basis.br1(1))
    m_poly = from_coeff_residues(basis, red)
    return rp_scalar_mul(basis, m_poly, params.delta_mont)


_scale_jit = jax.jit(_scale_core)


def scale_plaintext(plaintext: Plaintext, params: BfvParams) -> RnsPoly:
    """Delta * m as an RnsPoly (reference encrypt.rs:181-229)."""
    fn = _scale_jit if _config.jit_enabled() else _scale_core
    return fn(_plaintext_pair(plaintext, params), params)


@partial(jax.jit, static_argnames=("batch_shape",))
def _encrypt_pk_core(key, pt_pair, pk: PublicKey, batch_shape) -> BfvCiphertext:
    params = pk.params
    basis = params.ct_basis
    delta_m = _scale_core(pt_pair, params)
    k_u, k_e1, k_e2 = jax.random.split(key, 3)
    u = sample_binary_rns(k_u, basis, batch_shape)
    e1 = sample_gaussian_rns(k_e1, basis, params.sigma, batch_shape)
    e2 = sample_gaussian_rns(k_e2, basis, params.sigma, batch_shape)
    c0 = rp_add(basis, rp_add(basis, rp_mul(basis, pk.pk0, u), e1), delta_m)
    c1 = rp_add(basis, rp_mul(basis, pk.pk1, u), e2)
    return BfvCiphertext(c=(c0, c1), params=params)


def encrypt_pk(key, plaintext: Plaintext, pk: PublicKey,
               batch_shape=None) -> BfvCiphertext:
    """ct = (pk0 u + e1 + Delta m, pk1 u + e2), u binary
    (reference encrypt.rs:29-64).

    batch_shape defaults to the plaintext's leading dims: one independent
    ciphertext (fresh randomness) per plaintext row.
    """
    pair = _plaintext_pair(plaintext, pk.params)
    if batch_shape is None:
        batch_shape = pair[0].shape[:-1]
    core = _encrypt_pk_core if _config.jit_enabled() else _encrypt_pk_core.__wrapped__
    return core(key, pair, pk, tuple(batch_shape))


@partial(jax.jit, static_argnames=("batch_shape",))
def _encrypt_sk_core(key, pt_pair, sk: SecretKey, batch_shape) -> BfvCiphertext:
    params = sk.params
    basis = params.ct_basis
    delta_m = _scale_core(pt_pair, params)
    k_a, k_e = jax.random.split(key)
    a = sample_uniform_rns(k_a, basis, batch_shape)
    e = sample_gaussian_rns(k_e, basis, params.sigma, batch_shape)
    c0 = rp_add(basis, rp_add(basis, rp_neg(basis, rp_mul(basis, a, sk.poly)), e),
                delta_m)
    return BfvCiphertext(c=(c0, a), params=params)


def encrypt_sk(key, plaintext: Plaintext, sk: SecretKey,
               batch_shape=None) -> BfvCiphertext:
    """ct = (-a s + e + Delta m, a) (reference encrypt.rs:79-106).

    batch_shape defaults to the plaintext's leading dims: one independent
    ciphertext (fresh randomness) per plaintext row.
    """
    pair = _plaintext_pair(plaintext, sk.params)
    if batch_shape is None:
        batch_shape = pair[0].shape[:-1]
    core = _encrypt_sk_core if _config.jit_enabled() else _encrypt_sk_core.__wrapped__
    return core(key, pair, sk, tuple(batch_shape))


def phase(ct: BfvCiphertext, sk: SecretKey) -> RnsPoly:
    """c0 + c1 s + c2 s^2 + ... in RNS-NTT domain (reference encrypt.rs:117-124)."""
    basis = ct.params.ct_basis
    acc = ct.c[0]
    s_pow = sk.poly
    for i in range(1, len(ct.c)):
        acc = rp_add(basis, acc, rp_mul(basis, ct.c[i], s_pow))
        if i + 1 < len(ct.c):
            s_pow = rp_mul(basis, s_pow, sk.poly)
    return acc


@jax.jit
def _phase_residues(ct: BfvCiphertext, sk: SecretKey):
    """Jitted device part of decryption: phase + INTT + de-Montgomery."""
    from ..ring.rns import to_coeff_residues

    return to_coeff_residues(ct.params.ct_basis, phase(ct, sk))


def phase_residues_host(ct: BfvCiphertext, sk: SecretKey) -> np.ndarray:
    """Standard-form phase residues pulled to host as uint64 [..., L, n]."""
    lo, hi = _phase_residues(ct, sk)
    return w.from_pair_np(np.asarray(lo), np.asarray(hi))


def decrypt(ct: BfvCiphertext, sk: SecretKey) -> Plaintext:
    """m = round(p * phase / Q) mod p, exact host CRT scaling
    (reference encrypt.rs:111-178).

    The CRT + rounding runs in the native C++ kernel when available
    (exacto_tpu.native); the Python-int path is the fallback oracle.
    """
    params = ct.params
    residues = phase_residues_host(ct, sk)
    p = params.plain_modulus

    from ..native import available as native_available, crt_round_scale

    if native_available() and params.big_q * p < 1 << 320 and len(params.moduli) <= 5:
        out = crt_round_scale(residues, params.moduli, p)
        return Plaintext(coeffs=out, modulus=p)

    xs = crt_to_ints_host(params.ct_basis, residues)
    big_q = params.big_q
    half_q = big_q >> 1
    flat = xs.reshape(-1)
    out = np.empty(flat.shape, dtype=np.uint64)
    for i, x in enumerate(flat):
        out[i] = ((int(x) * p + half_q) // big_q) % p
    return Plaintext(coeffs=out.reshape(xs.shape), modulus=p)


def noise_inf_norm(ct: BfvCiphertext, sk: SecretKey, expected: Plaintext) -> np.ndarray:
    """Max |phase - Delta*m| over coefficients (centered) — the noise meter.

    First-class port of the repro binary's measurement
    (/root/reference/src/bin/paper_repro.rs:249-281), exposed as API per the
    survey's observability note.
    """
    params = ct.params
    residues = phase_residues_host(ct, sk)
    xs = crt_to_ints_host(params.ct_basis, residues)
    big_q = params.big_q
    delta = params.delta
    m = np.asarray(expected.coeffs, dtype=np.uint64)
    flat_x = xs.reshape(-1, params.ring_degree)
    flat_m = np.broadcast_to(m, flat_x.shape) if m.ndim == 1 else m.reshape(-1, params.ring_degree)
    worst = 0
    for b in range(flat_x.shape[0]):
        for j in range(params.ring_degree):
            diff = (int(flat_x[b, j]) - delta * int(flat_m[b, j])) % big_q
            if diff > big_q // 2:
                diff -= big_q
            worst = max(worst, abs(diff))
    return worst
