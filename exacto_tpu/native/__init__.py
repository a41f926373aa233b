"""Native host-runtime kernels (C++ via ctypes).

Hot host-side loops — CRT composition, round(p*x/Q) decryption scaling,
centered reductions — implemented in C++ with fixed-width 320-bit integer
arithmetic (supports up to 5 RNS primes < 2^62).  Built on demand with g++;
Python-int fallbacks in exacto_tpu.ring.rns remain authoritative oracles.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libcrtkernels.so")
_SRC = os.path.join(_DIR, "crt_kernels.cpp")

_W = 5  # words per bignum, must match crt_kernels.cpp

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        try:
            subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                           check=True, capture_output=True)
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_SO)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.crt_round_scale.argtypes = [u64p, ctypes.c_int, ctypes.c_longlong,
                                        u64p, u64p, ctypes.c_uint64, u64p]
        lib.crt_center_mod.argtypes = [u64p, ctypes.c_int, ctypes.c_longlong,
                                       u64p, u64p, ctypes.c_uint64, u64p]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def _words(x: int) -> np.ndarray:
    return np.array([(x >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(_W)],
                    dtype=np.uint64)


def _crt_terms(moduli) -> tuple[np.ndarray, int]:
    from ..ring import hostmath as hm

    big_q = 1
    for m in moduli:
        big_q *= m
    terms = np.zeros((len(moduli), _W), dtype=np.uint64)
    for i, m in enumerate(moduli):
        q_star = big_q // m
        terms[i] = _words(q_star * hm.mod_inv(q_star % m, m) % big_q)
    return terms, big_q


def crt_round_scale(residues: np.ndarray, moduli, p: int) -> np.ndarray:
    """residues [..., L, n] uint64 -> round(p * CRT(x) / Q) mod p, uint64 [..., n].

    Native equivalent of the decrypt scaling loop; requires len(moduli) <= 5
    and Q < 2^256 (fixed-width headroom for the intermediate products).
    """
    lib = _load()
    if not lib:
        raise RuntimeError("native kernels unavailable")
    moduli = tuple(int(m) for m in moduli)
    if len(moduli) > _W:
        raise ValueError(f"at most {_W} RNS primes supported natively")
    terms, big_q = _crt_terms(moduli)
    if big_q * p >= 1 << (64 * _W):
        raise ValueError("p * Q exceeds native bignum width")
    res = np.ascontiguousarray(np.asarray(residues, dtype=np.uint64))
    L = res.shape[-2]
    n = res.shape[-1]
    batch = res.shape[:-2]
    count = int(np.prod(batch, dtype=np.int64)) * n if batch else n
    # layout [L, count]
    flat = np.moveaxis(res.reshape(-1, L, n), 1, 0).reshape(L, -1)
    flat = np.ascontiguousarray(flat)
    out = np.zeros(flat.shape[1], dtype=np.uint64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.crt_round_scale(flat.ctypes.data_as(u64p), L, flat.shape[1],
                        np.ascontiguousarray(terms).ctypes.data_as(u64p),
                        np.ascontiguousarray(_words(big_q)).ctypes.data_as(u64p),
                        p, out.ctypes.data_as(u64p))
    return out.reshape(batch + (n,))


def crt_center_mod(residues: np.ndarray, moduli, target: int) -> np.ndarray:
    """residues [..., L, n] -> centered CRT value mod `target`, uint64 [..., n]."""
    lib = _load()
    if not lib:
        raise RuntimeError("native kernels unavailable")
    moduli = tuple(int(m) for m in moduli)
    if len(moduli) > _W:
        raise ValueError(f"at most {_W} RNS primes supported natively")
    terms, big_q = _crt_terms(moduli)
    res = np.ascontiguousarray(np.asarray(residues, dtype=np.uint64))
    L = res.shape[-2]
    n = res.shape[-1]
    batch = res.shape[:-2]
    flat = np.moveaxis(res.reshape(-1, L, n), 1, 0).reshape(L, -1)
    flat = np.ascontiguousarray(flat)
    out = np.zeros(flat.shape[1], dtype=np.uint64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.crt_center_mod(flat.ctypes.data_as(u64p), L, flat.shape[1],
                       np.ascontiguousarray(terms).ctypes.data_as(u64p),
                       np.ascontiguousarray(_words(big_q)).ctypes.data_as(u64p),
                       target, out.ctypes.data_as(u64p))
    return out.reshape(batch + (n,))
