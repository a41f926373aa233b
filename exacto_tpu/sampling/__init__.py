"""RLWE samplers: discrete Gaussian (CDT), uniform, ternary, binary.

TPU-native counterpart of /root/reference/src/sampling/: the reference's
constant-time CDT scan (gaussian.rs:38-70) becomes a precomputed fixed-point
CDT table and a branchless vectorized compare-and-count — the table is built
once per sigma instead of per sample (fixing the reference's per-sample
rebuild noted in SURVEY.md), and TPU execution is data-oblivious by
construction.

RNG: `jax.random` (threefry counter-based PRNG) with functional key threading
replaces the reference's ChaCha20Rng; every keygen/encrypt entry point takes
an explicit key (the analogue of the reference's `_with_rng` seams,
bfv/encrypt.rs:29), so tests are deterministic.  Threefry is not a certified
CSPRNG; production deployments should treat key/noise generation as a
host-side concern if certification matters.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ring import wordops as w
from ..ring.rns import RnsBasis, RnsPoly, from_coeff_residues, from_signed_coeffs


@lru_cache(maxsize=None)
def _cdt_table(sigma: float, tail_factor: float = 6.0) -> np.ndarray:
    """Cumulative distribution table for the discrete Gaussian, 64-bit fixed point.

    Entry t[i] = round(2^64 * P[X <= lo + i]) for X ~ D_sigma on
    [lo, hi] = [-ceil(tail*sigma), +ceil(tail*sigma)] (reference
    gaussian.rs:38-53 uses the same +-6 sigma cut).
    """
    tail = math.ceil(tail_factor * sigma)
    xs = np.arange(-tail, tail + 1)
    probs = np.exp(-(xs.astype(np.float64) ** 2) / (2.0 * sigma * sigma))
    probs /= probs.sum()
    cum = np.cumsum(probs)
    cum[-1] = 1.0
    # exact integer clamp: float64 cannot represent 2^64 - 1
    table = np.array([min(int(round(c * 2**64)), 2**64 - 1) for c in cum],
                     dtype=object)
    return table.astype(np.uint64)


def sample_gaussian_signed(key, sigma: float, shape) -> jnp.ndarray:
    """Signed int32 discrete-Gaussian samples via branchless CDT inversion."""
    table = _cdt_table(float(sigma))
    tail = (len(table) - 1) // 2
    t_lo, t_hi = w.to_pair_np(table)
    t_lo = jnp.asarray(t_lo).reshape((len(table),) + (1,) * len(shape))
    t_hi = jnp.asarray(t_hi).reshape((len(table),) + (1,) * len(shape))
    bits = jax.random.bits(key, shape=(2,) + tuple(shape), dtype=jnp.uint32)
    u = (bits[0], bits[1])
    # index = #entries with table < u  ->  inverse CDF
    lt = w.gt64(u, (t_lo, t_hi))  # [T, *shape] bool
    idx = jnp.sum(lt.astype(jnp.int32), axis=0)
    return idx - tail


def sample_ternary_signed(key, shape) -> jnp.ndarray:
    """Uniform {-1, 0, +1} int32 (reference uniform.rs:29-46)."""
    return jax.random.randint(key, tuple(shape), 0, 3, dtype=jnp.int32) - 1


def sample_binary_signed(key, shape) -> jnp.ndarray:
    """Uniform {0, 1} int32 (reference uniform.rs:49-54)."""
    return jax.random.randint(key, tuple(shape), 0, 2, dtype=jnp.int32)


def sample_uniform_rns(key, basis: RnsBasis, batch_shape=()) -> RnsPoly:
    """Uniform element of R_Q: independent uniform residues per prime.

    Each residue is a 128-bit draw reduced mod q_i (statistical distance
    < 2^-66 from uniform) — branchless, unlike the reference's
    mask-and-reject loop (uniform.rs:5-24).  NOTE: for multi-prime Q this is
    uniform over Z_Q via CRT, which strictly improves on the reference's
    "uniform mod q_0 then reduce" (keygen.rs:96) — divergence documented.
    """
    shape = tuple(batch_shape) + (basis.num_moduli, basis.ring_degree)
    bits = jax.random.bits(key, shape=(4,) + shape, dtype=jnp.uint32)
    t = (bits[0], bits[1], bits[2], bits[3])
    red = w.mod_from_u128(t, basis.bq(1), basis.bqinv(1), basis.br1(1), basis.br2(1))
    return from_coeff_residues(basis, red)


def sample_gaussian_rns(key, basis: RnsBasis, sigma: float, batch_shape=()) -> RnsPoly:
    """Gaussian noise polynomial as RnsPoly (NTT-Montgomery domain)."""
    v = sample_gaussian_signed(key, sigma, tuple(batch_shape) + (basis.ring_degree,))
    return from_signed_coeffs(basis, v)


def sample_ternary_rns(key, basis: RnsBasis, batch_shape=()) -> RnsPoly:
    v = sample_ternary_signed(key, tuple(batch_shape) + (basis.ring_degree,))
    return from_signed_coeffs(basis, v)


def sample_binary_rns(key, basis: RnsBasis, batch_shape=()) -> RnsPoly:
    v = sample_binary_signed(key, tuple(batch_shape) + (basis.ring_degree,))
    return from_signed_coeffs(basis, v)
