"""Bit-exact parity harness vs the Rust reference (RajeshRk18/exacto).

The reference exposes `_with_rng` seams taking a `ChaCha20Rng`
(e.g. /root/reference/src/bfv/encrypt.rs:29,79, keygen.rs:64-79), and its
tests fix seeds with `ChaCha20Rng::seed_from_u64(42)`.  This module
reimplements that exact randomness pipeline so that, for the same seed and
parameters, every sampled polynomial — and therefore every key and
ciphertext — is bit-identical to what the Rust library produces:

  * `ChaCha20Rng`: rand_chacha v0.9 semantics — ChaCha20 block function
    (verified against the RFC 8439 test vector), 4-block (256-byte) refills,
    rand_core `BlockRng` word/straddle behavior for next_u32/next_u64, and
    rand_core's PCG32-based `seed_from_u64` seed filler.
  * `random_u8/u64/f64`: rand v0.9 `StandardUniform` consumption — u8 takes
    one u32 word (low byte), u64 takes two words (low first), f64 is the
    53-bit multiply method `(next_u64() >> 11) * 2^-53`.
  * Samplers consuming the stream in the reference's exact order and with
    its exact rejection rules (src/sampling/uniform.rs, gaussian.rs):
    uniform = mask-and-reject on next_u64; ternary = reject-3 on
    `random::<u8>() & 3` mapping 0,1,2 -> q-1,0,1; binary = next_u64 & 1;
    gaussian = per-sample f64 CDT scan (table rebuilt per sample with f64
    accumulation in the same order, so comparisons agree bit-for-bit except
    in the ~2^-40 event that u lands within one cross-libm ulp of a table
    boundary).
  * Keygen/encrypt builders mirroring the reference's sampling order and
    arithmetic (keygen.rs:64-239, encrypt.rs:29-106): samples are drawn at
    modulus q_0 = ct_basis.moduli[0] then residue-reduced per prime, exactly
    like `RnsPoly::from_coeff_poly` (src/ring/rns.rs:84-105).

Everything downstream of sampling is exact modular arithmetic, so parity at
the sampled-polynomial level implies parity of every ciphertext/key residue
and of decrypt outputs.  `tests/test_parity.py` cross-checks the engine's
ciphertexts against an independent pure-Python big-int oracle.

Rust cannot run in this image, so the harness is validated three ways:
the ChaCha core against RFC 8439, the BlockRng/seed_from_u64 layers against
the rand_core/rand_chacha v0.9 algorithms they implement, and the full
pipeline against the Python oracle.  Running the Rust reference elsewhere
with the same seed must reproduce these exact values.
"""

from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------------------
# ChaCha20 core (RFC 8439 block function)
# ---------------------------------------------------------------------------

_M32 = 0xFFFFFFFF


def _rotl(x, r):
    return ((x << r) | (x >> (32 - r))) & _M32


def _quarter(s, a, b, c, d):
    s[a] = (s[a] + s[b]) & _M32
    s[d] = _rotl(s[d] ^ s[a], 16)
    s[c] = (s[c] + s[d]) & _M32
    s[b] = _rotl(s[b] ^ s[c], 12)
    s[a] = (s[a] + s[b]) & _M32
    s[d] = _rotl(s[d] ^ s[a], 8)
    s[c] = (s[c] + s[d]) & _M32
    s[b] = _rotl(s[b] ^ s[c], 7)


def chacha20_block(key_words, counter_words, nonce_words):
    """One 64-byte ChaCha20 block -> 16 output u32 words.

    key_words: 8 u32; counter_words + nonce_words: 4 u32 total filling state
    words 12..16 (rand_chacha uses a 64-bit counter in words 12-13 and a
    64-bit stream id in words 14-15; RFC 8439 uses 32-bit counter + 96-bit
    nonce — the block function itself is identical).
    """
    init = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574] + \
        list(key_words) + list(counter_words) + list(nonce_words)
    s = init[:]
    for _ in range(10):
        _quarter(s, 0, 4, 8, 12)
        _quarter(s, 1, 5, 9, 13)
        _quarter(s, 2, 6, 10, 14)
        _quarter(s, 3, 7, 11, 15)
        _quarter(s, 0, 5, 10, 15)
        _quarter(s, 1, 6, 11, 12)
        _quarter(s, 2, 7, 8, 13)
        _quarter(s, 3, 4, 9, 14)
    return [(a + b) & _M32 for a, b in zip(s, init)]


class ChaCha20Rng:
    """rand_chacha v0.9 `ChaCha20Rng` bit-exact reimplementation.

    Stream layout: 64-bit block counter (state words 12-13, starts at 0),
    64-bit stream id (words 14-15, 0 by default).  Refills 4 blocks (64 u32
    words) at a time like rand_chacha's wide backend; word order is the four
    blocks' serialized states in sequence.  next_u32/next_u64 follow
    rand_core's `BlockRng` (u64 = two consecutive words, low first, with the
    end-of-buffer straddle rule).
    """

    BUF_WORDS = 64  # 4 blocks x 16 words

    def __init__(self, seed_bytes: bytes):
        if len(seed_bytes) != 32:
            raise ValueError("ChaCha20Rng seed must be 32 bytes")
        self.key = [int.from_bytes(seed_bytes[4 * i:4 * i + 4], "little")
                    for i in range(8)]
        self.stream = (0, 0)
        self.counter = 0  # block counter
        self.results: list[int] = []
        self.index = self.BUF_WORDS

    @classmethod
    def seed_from_u64(cls, state: int) -> "ChaCha20Rng":
        """rand_core v0.9 `SeedableRng::seed_from_u64`: PCG32 seed filler."""
        MUL = 6364136223846793005
        INC = 11634580027462260723
        state &= (1 << 64) - 1
        seed = b""
        for _ in range(8):
            state = (state * MUL + INC) & ((1 << 64) - 1)
            xorshifted = (((state >> 18) ^ state) >> 27) & _M32
            rot = state >> 59
            x = ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & _M32
            seed += x.to_bytes(4, "little")
        return cls(seed)

    def _generate(self):
        # all 4 blocks of the refill vectorized over one numpy axis
        # (bit-identical to 4 scalar chacha20_block calls; _M32 wraps are
        # native uint32 overflow)
        ctrs = [self.counter + b for b in range(4)]
        init = np.empty((16, 4), dtype=np.uint32)
        consts = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)
        for i in range(4):
            init[i] = consts[i]
        for i in range(8):
            init[4 + i] = self.key[i]
        init[12] = [c & _M32 for c in ctrs]
        init[13] = [(c >> 32) & _M32 for c in ctrs]
        init[14] = self.stream[0]
        init[15] = self.stream[1]
        s = init.copy()

        def rotl(x, r):
            return (x << np.uint32(r)) | (x >> np.uint32(32 - r))

        def quarter(a, b, c, d):
            s[a] += s[b]
            s[d] = rotl(s[d] ^ s[a], 16)
            s[c] += s[d]
            s[b] = rotl(s[b] ^ s[c], 12)
            s[a] += s[b]
            s[d] = rotl(s[d] ^ s[a], 8)
            s[c] += s[d]
            s[b] = rotl(s[b] ^ s[c], 7)

        with np.errstate(over="ignore"):
            for _ in range(10):
                quarter(0, 4, 8, 12)
                quarter(1, 5, 9, 13)
                quarter(2, 6, 10, 14)
                quarter(3, 7, 11, 15)
                quarter(0, 5, 10, 15)
                quarter(1, 6, 11, 12)
                quarter(2, 7, 8, 13)
                quarter(3, 4, 9, 14)
            s += init
        self.counter += 4
        # word order: the four blocks' serialized states in sequence
        self.results = [int(s[w, b]) for b in range(4) for w in range(16)]

    def _generate_and_set(self, index: int):
        self._generate()
        self.index = index

    def next_u32(self) -> int:
        if self.index >= self.BUF_WORDS:
            self._generate_and_set(0)
        v = self.results[self.index]
        self.index += 1
        return v

    def next_u64(self) -> int:
        i = self.index
        if i < self.BUF_WORDS - 1:
            self.index += 2
            return self.results[i] | (self.results[i + 1] << 32)
        if i >= self.BUF_WORDS:
            self._generate_and_set(2)
            return self.results[0] | (self.results[1] << 32)
        # straddle: last word is the low half, refill for the high half
        lo = self.results[self.BUF_WORDS - 1]
        self._generate_and_set(1)
        return lo | (self.results[0] << 32)

    # rand v0.9 StandardUniform consumption
    def random_u8(self) -> int:
        return self.next_u32() & 0xFF

    def random_u64(self) -> int:
        return self.next_u64()

    def random_f64(self) -> float:
        # float_impls! multiply method: 53 significant bits
        return (self.next_u64() >> 11) * (1.0 / (1 << 53))


# ---------------------------------------------------------------------------
# reference-order samplers (src/sampling/uniform.rs, gaussian.rs)
# ---------------------------------------------------------------------------

def sample_uniform_poly(n: int, modulus: int, rng: ChaCha20Rng) -> np.ndarray:
    """uniform.rs:5-24: next-power-of-two mask + rejection on next_u64."""
    if modulus & (modulus - 1) == 0:
        mask = modulus - 1
    else:
        mask = (1 << modulus.bit_length()) - 1
    out = np.empty(n, dtype=np.uint64)
    for i in range(n):
        while True:
            v = rng.random_u64() & mask
            if v < modulus:
                out[i] = v
                break
    return out


def sample_ternary_poly(n: int, modulus: int, rng: ChaCha20Rng) -> np.ndarray:
    """uniform.rs:29-46: 2-bit rejection on random::<u8>; 0,1,2 -> q-1,0,1."""
    out = np.empty(n, dtype=np.uint64)
    lut = (modulus - 1, 0, 1)
    for i in range(n):
        while True:
            r = rng.random_u8() & 0x03
            if r < 3:
                out[i] = lut[r]
                break
    return out


def sample_binary_poly(n: int, modulus: int, rng: ChaCha20Rng) -> np.ndarray:
    """uniform.rs:49-54: next_u64 & 1."""
    return np.array([rng.random_u64() & 1 for _ in range(n)], dtype=np.uint64)


_CDT_CACHE: dict = {}


def _cdt_table(sigma: float):
    """The reference rebuilds the f64 CDT per sample (gaussian.rs:42-53),
    but the rebuild is deterministic — same accumulation order, same values
    — so caching it is bit-identical and ~40x faster."""
    tab = _CDT_CACHE.get(sigma)
    if tab is None:
        tail = math.ceil(6.0 * sigma)
        two_sigma_sq = 2.0 * sigma * sigma
        cdf = []
        cumulative = 0.0
        for x in range(-tail, tail + 1):
            cumulative += math.exp(-(float(x * x)) / two_sigma_sq)
            cdf.append(cumulative)
        tab = (tail, np.array(cdf, dtype=np.float64), cumulative)
        _CDT_CACHE[sigma] = tab
    return tab


def sample_discrete_gaussian(sigma: float, rng: ChaCha20Rng) -> int:
    """gaussian.rs:38-70: f64 CDT + reverse scan.

    The scan selects the LOWEST i with u < cdf[i] (default tail), which is
    exactly searchsorted-right on the cumulative table.
    """
    tail, cdf, total = _cdt_table(sigma)
    u = rng.random_f64() * total
    idx = int(np.searchsorted(cdf, u, side="right"))
    return -tail + min(idx, 2 * tail)


def sample_gaussian_poly(n: int, modulus: int, sigma: float,
                         rng: ChaCha20Rng) -> np.ndarray:
    """gaussian.rs:15-27: signed samples mapped into [0, q)."""
    out = np.empty(n, dtype=np.uint64)
    for i in range(n):
        s = sample_discrete_gaussian(sigma, rng)
        # Rust: (q + (s % q)) % q with truncating %, i.e. q - (|s| % q) for s < 0
        out[i] = s % modulus if s >= 0 else (modulus - ((-s) % modulus)) % modulus
    return out


# ---------------------------------------------------------------------------
# reference-order keygen / encrypt builders (wide engine objects)
# ---------------------------------------------------------------------------

def _residues(basis, coeffs: np.ndarray) -> np.ndarray:
    """coeffs u64 [n] (< q_0) -> per-prime residues [L, n]
    (RnsPoly::from_coeff_poly, src/ring/rns.rs:84-105)."""
    return np.stack([coeffs % np.uint64(m) for m in basis.moduli])


def gen_secret_key_with_rng(rng: ChaCha20Rng, params):
    """keygen.rs:64-79: ternary at modulus q_0, residue-spread, NTT."""
    from .bfv.keygen import SecretKey
    from .ring.rns import from_host_residues

    basis = params.ct_basis
    coeffs = sample_ternary_poly(params.ring_degree, basis.moduli[0], rng)
    return SecretKey(poly=from_host_residues(basis, _residues(basis, coeffs)),
                     params=params)


def gen_public_key_with_rng(rng: ChaCha20Rng, sk):
    """keygen.rs:87-113: a uniform then e gaussian; pk = (-(a s + e), a)."""
    from .bfv.keygen import PublicKey
    from .ring.rns import from_host_residues, rp_add, rp_mul, rp_neg

    params = sk.params
    basis = params.ct_basis
    n = params.ring_degree
    q0 = basis.moduli[0]
    a = from_host_residues(basis, _residues(
        basis, sample_uniform_poly(n, q0, rng)))
    e = from_host_residues(basis, _residues(
        basis, sample_gaussian_poly(n, q0, params.sigma, rng)))
    pk0 = rp_neg(basis, rp_add(basis, rp_mul(basis, a, sk.poly), e))
    return PublicKey(pk0=pk0, pk1=a, params=params)


def _keyswitch_with_rng(rng: ChaCha20Rng, sk, target):
    """keygen.rs:123-162 sampling order: per digit, a_i then e_i; the gadget
    ladder multiplies `target` by base^i via repeated scalar_mul."""
    import jax.numpy as jnp

    from .ring import wordops as w
    from .ring.rns import RnsPoly, from_host_residues, rp_add, rp_mul, rp_neg

    params = sk.params
    basis = params.ct_basis
    n = params.ring_degree
    q0 = basis.moduli[0]
    D = params.gadget_digits
    a_rows = []
    e_rows = []
    for _ in range(D):
        a_rows.append(_residues(basis, sample_uniform_poly(n, q0, rng)))
        e_rows.append(_residues(
            basis, sample_gaussian_poly(n, q0, params.sigma, rng)))
    a = from_host_residues(basis, np.stack(a_rows))     # [D, L, n]
    e = from_host_residues(basis, np.stack(e_rows))
    g = np.array([[pow(params.gadget_base, i, m) * (1 << 64) % m
                   for m in basis.moduli] for i in range(D)],
                 dtype=object).astype(np.uint64)
    glo, ghi = w.to_pair_np(g)
    gp = (jnp.asarray(glo)[..., None], jnp.asarray(ghi)[..., None])
    gt = w.mont_mul(target.pair, gp, basis.bq(1), basis.bqinv(1))
    g_target = RnsPoly(lo=gt[0], hi=gt[1])
    neg_ase = rp_neg(basis, rp_add(basis, rp_mul(basis, a, sk.poly), e))
    return rp_add(basis, neg_ase, g_target), a


def gen_relin_key_with_rng(rng: ChaCha20Rng, sk):
    from .bfv.keygen import RelinKey
    from .ring.rns import rp_mul

    s_sq = rp_mul(sk.params.ct_basis, sk.poly, sk.poly)
    rlk0, rlk1 = _keyswitch_with_rng(rng, sk, s_sq)
    return RelinKey(rlk0=rlk0, rlk1=rlk1, params=sk.params)


def gen_galois_key_with_rng(rng: ChaCha20Rng, sk, element: int):
    from .bfv.keygen import GaloisKey
    from .ring.rns import rp_automorphism

    s_auto = rp_automorphism(sk.params.ct_basis, sk.poly, element)
    ks0, ks1 = _keyswitch_with_rng(rng, sk, s_auto)
    return GaloisKey(ks0=ks0, ks1=ks1, element=int(element), params=sk.params)


def encrypt_sk_with_rng(rng: ChaCha20Rng, plaintext, sk):
    """encrypt.rs:79-106: a uniform then e gaussian; ct = (-a s + e + Dm, a)."""
    from .bfv import BfvCiphertext
    from .bfv.encrypt import scale_plaintext
    from .ring.rns import from_host_residues, rp_add, rp_mul, rp_neg

    params = sk.params
    basis = params.ct_basis
    n = params.ring_degree
    q0 = basis.moduli[0]
    delta_m = scale_plaintext(plaintext, params)
    a = from_host_residues(basis, _residues(
        basis, sample_uniform_poly(n, q0, rng)))
    e = from_host_residues(basis, _residues(
        basis, sample_gaussian_poly(n, q0, params.sigma, rng)))
    c0 = rp_add(basis, rp_add(basis, rp_neg(basis, rp_mul(basis, a, sk.poly)),
                              e), delta_m)
    return BfvCiphertext(c=(c0, a), params=params)


def encrypt_pk_with_rng(rng: ChaCha20Rng, plaintext, pk):
    """encrypt.rs:29-64: u binary, e1, e2 gaussian;
    ct = (pk0 u + e1 + Dm, pk1 u + e2)."""
    from .bfv import BfvCiphertext
    from .bfv.encrypt import scale_plaintext
    from .ring.rns import from_host_residues, rp_add, rp_mul

    params = pk.params
    basis = params.ct_basis
    n = params.ring_degree
    q0 = basis.moduli[0]
    delta_m = scale_plaintext(plaintext, params)
    u = from_host_residues(basis, _residues(
        basis, sample_binary_poly(n, q0, rng)))
    e1 = from_host_residues(basis, _residues(
        basis, sample_gaussian_poly(n, q0, params.sigma, rng)))
    e2 = from_host_residues(basis, _residues(
        basis, sample_gaussian_poly(n, q0, params.sigma, rng)))
    c0 = rp_add(basis, rp_add(basis, rp_mul(basis, pk.pk0, u), e1), delta_m)
    c1 = rp_add(basis, rp_mul(basis, pk.pk1, u), e2)
    return BfvCiphertext(c=(c0, c1), params=params)


def dbfv_encrypt_with_rng(rng: ChaCha20Rng, value: int, pk, params):
    """dbfv/encrypt.rs:17-115: digit-decompose then per-digit pk-encrypt,
    consuming the stream in digit order."""
    import jax.numpy as jnp

    from .bfv import BfvCiphertext
    from .bfv.encoding import Plaintext
    from .dbfv.ciphertext import DbfvCiphertext
    from .dbfv.decomposition import digit_decompose
    from .ring.rns import RnsPoly

    p = params.effective_plain_modulus
    digits = digit_decompose(int(value) % p, params.base, params.num_digits)
    n = params.bfv_params.ring_degree
    t = params.bfv_params.plain_modulus
    limbs = []
    for dig in digits:
        coeffs = np.zeros(n, dtype=np.uint64)
        coeffs[0] = dig
        limbs.append(encrypt_pk_with_rng(
            rng, Plaintext(coeffs=coeffs, modulus=t), pk))
    # stack per-digit BFV cts along the limb axis at -3
    comps = []
    for k in range(2):
        comps.append(RnsPoly(
            lo=jnp.stack([l.c[k].lo for l in limbs], axis=-3),
            hi=jnp.stack([l.c[k].hi for l in limbs], axis=-3)))
    stacked = BfvCiphertext(c=tuple(comps), params=params.bfv_params)
    return DbfvCiphertext(limbs=stacked, degree=params.num_digits,
                          mul_depth=0, params=params)
