// Host-side exact CRT / rounding kernels for exacto_tpu.
//
// The decrypt verification path composes RNS residues into full-precision
// integers and computes round(p * x / Q) mod p (the role of the reference's
// BigUint loops, /root/reference/src/bfv/encrypt.rs:142-172).  Python-int
// loops are the fallback; this C++ implementation (fixed-width 320-bit
// arithmetic, enough for 5 RNS primes < 2^62) is the production host path,
// exposed through ctypes (no pybind11 in the image).
//
// Build: g++ -O2 -shared -fPIC -o libcrtkernels.so crt_kernels.cpp

#include <cstdint>
#include <cstring>

using u64 = std::uint64_t;
using u128 = unsigned __int128;

namespace {

constexpr int W = 5;  // 5 x 64-bit words = 320 bits

struct Big {
    u64 w[W];
};

inline Big big_zero() {
    Big b;
    std::memset(b.w, 0, sizeof(b.w));
    return b;
}

inline Big big_from_u64(u64 x) {
    Big b = big_zero();
    b.w[0] = x;
    return b;
}

inline int big_cmp(const Big& a, const Big& b) {
    for (int i = W - 1; i >= 0; --i) {
        if (a.w[i] != b.w[i]) return a.w[i] < b.w[i] ? -1 : 1;
    }
    return 0;
}

inline Big big_add(const Big& a, const Big& b) {
    Big r;
    u128 carry = 0;
    for (int i = 0; i < W; ++i) {
        u128 s = (u128)a.w[i] + b.w[i] + carry;
        r.w[i] = (u64)s;
        carry = s >> 64;
    }
    return r;
}

inline Big big_sub(const Big& a, const Big& b) {
    Big r;
    u128 borrow = 0;
    for (int i = 0; i < W; ++i) {
        u128 d = (u128)a.w[i] - b.w[i] - borrow;
        r.w[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    return r;
}

inline Big big_mul_u64(const Big& a, u64 m) {
    Big r;
    u128 carry = 0;
    for (int i = 0; i < W; ++i) {
        u128 p = (u128)a.w[i] * m + carry;
        r.w[i] = (u64)p;
        carry = p >> 64;
    }
    return r;  // overflow beyond W words must not happen by construction
}

// remainder of a (W words) modulo 64-bit m
inline u64 big_mod_u64(const Big& a, u64 m) {
    u128 rem = 0;
    for (int i = W - 1; i >= 0; --i) {
        rem = ((rem << 64) | a.w[i]) % m;
    }
    return (u64)rem;
}

// divide a by 64-bit d, return quotient (a assumed < d << (64*(W-1)))
inline Big big_div_u64(const Big& a, u64 d, u64* rem_out) {
    Big q = big_zero();
    u128 rem = 0;
    for (int i = W - 1; i >= 0; --i) {
        u128 cur = (rem << 64) | a.w[i];
        q.w[i] = (u64)(cur / d);
        rem = cur % d;
    }
    if (rem_out) *rem_out = (u64)rem;
    return q;
}

// floor(a / b) for general b via shift-subtract (b != 0); both W words.
// Used once per division; n is small so this is fine.
inline Big big_div(const Big& a, const Big& b) {
    // find highest bit of b
    int hb = -1;
    for (int i = W - 1; i >= 0 && hb < 0; --i) {
        if (b.w[i]) {
            for (int j = 63; j >= 0; --j) {
                if (b.w[i] >> j & 1) { hb = i * 64 + j; break; }
            }
        }
    }
    int ha = -1;
    for (int i = W - 1; i >= 0 && ha < 0; --i) {
        if (a.w[i]) {
            for (int j = 63; j >= 0; --j) {
                if (a.w[i] >> j & 1) { ha = i * 64 + j; break; }
            }
        }
    }
    Big q = big_zero();
    if (hb < 0 || ha < hb) return q;
    int shift = ha - hb;
    // sh = b << shift
    Big sh = big_zero();
    {
        int wsh = shift / 64, bsh = shift % 64;
        for (int i = W - 1; i >= 0; --i) {
            u64 v = 0;
            if (i - wsh >= 0) v = b.w[i - wsh] << bsh;
            if (bsh && i - wsh - 1 >= 0) v |= b.w[i - wsh - 1] >> (64 - bsh);
            sh.w[i] = v;
        }
    }
    Big rem = a;
    for (int s = shift; s >= 0; --s) {
        if (big_cmp(rem, sh) >= 0) {
            rem = big_sub(rem, sh);
            q.w[s / 64] |= (u64)1 << (s % 64);
        }
        // sh >>= 1
        for (int i = 0; i < W; ++i) {
            u64 lo = sh.w[i] >> 1;
            if (i + 1 < W) lo |= sh.w[i + 1] << 63;
            sh.w[i] = lo;
        }
    }
    return q;
}

}  // namespace

extern "C" {

// Compose residues[L][count] (flattened) into x mod Q, then out[i] =
// round(p * x / Q) mod p.  crt_terms[L][W] are precomputed
// (Q/q_i) * ((Q/q_i)^{-1} mod q_i) as W-word little-endian; big_q is Q.
void crt_round_scale(const u64* residues, int L, long long count,
                     const u64* crt_terms, const u64* big_q_words,
                     u64 p, u64* out) {
    Big big_q;
    std::memcpy(big_q.w, big_q_words, sizeof(big_q.w));
    u64 dummy;
    Big half_q = big_div_u64(big_q, 2, &dummy);

    for (long long i = 0; i < count; ++i) {
        Big acc = big_zero();
        for (int l = 0; l < L; ++l) {
            Big term;
            std::memcpy(term.w, crt_terms + (size_t)l * W, sizeof(term.w));
            acc = big_add(acc, big_mul_u64(term, residues[(size_t)l * count + i]));
        }
        // acc mod Q: acc < L * Q^2? no — acc < L * Q * max(q) < Q * 2^65ish;
        // reduce by repeated conditional subtraction after one division.
        Big quot = big_div(acc, big_q);
        acc = big_sub(acc, [&] {
            // quot * Q (fits W words by construction)
            Big r = big_zero();
            for (int wi = 0; wi < W; ++wi) {
                if (!quot.w[wi]) continue;
                // r += (Q * quot.w[wi]) << (64*wi)
                Big part = big_mul_u64(big_q, quot.w[wi]);
                Big shifted = big_zero();
                for (int k = 0; k + wi < W; ++k) shifted.w[k + wi] = part.w[k];
                r = big_add(r, shifted);
            }
            return r;
        }());
        while (big_cmp(acc, big_q) >= 0) acc = big_sub(acc, big_q);

        // round(p * acc / Q) mod p  — p < 2^36 so p*acc fits W+1 words only
        // if acc close to Q; use: scaled = (p*acc + Q/2) / Q computed via
        // floor((acc*p + half)/Q) with acc*p possibly W+1 words.
        // Split: acc = hi*2^64 + rest is messy; instead compute
        // q_div = acc / Q-scaled... use long division with u128 chunks:
        // x = p*acc (may need W+1 words) — handle with an extra word buffer.
        u64 xw[W + 1];
        u128 carry = 0;
        for (int k = 0; k < W; ++k) {
            u128 prod = (u128)acc.w[k] * p + carry;
            xw[k] = (u64)prod;
            carry = prod >> 64;
        }
        xw[W] = (u64)carry;
        // add Q/2
        carry = 0;
        for (int k = 0; k < W; ++k) {
            u128 s = (u128)xw[k] + half_q.w[k] + carry;
            xw[k] = (u64)s;
            carry = s >> 64;
        }
        xw[W] += (u64)carry;
        // divide (W+1 words) by Q via shift-subtract on W+1 words:
        // since result = round(p*x/Q) < p * 2, just compute floor via
        // iterative subtraction of Q<<k.  Simpler: compute via long double?
        // Exact route: use big_div on the top W words after normalizing:
        // all values: x < p*Q + Q/2 < Q*(p+1) so quotient fits in 64 bits.
        // Do binary long division over 64+ bits of quotient.
        u64 quotient = 0;
        // rem = xw (W+1 words); subtract (Q << b) for b = 63..0
        for (int b = 63; b >= 0; --b) {
            // tmp = Q << b  (W+1 words)
            u64 tw[W + 1];
            int wsh = b / 64, bsh = b % 64;  // wsh == 0 here since b < 64
            (void)wsh;
            u64 carry2 = 0;
            for (int k = 0; k < W; ++k) {
                tw[k] = (big_q.w[k] << bsh) | carry2;
                carry2 = bsh ? (big_q.w[k] >> (64 - bsh)) : 0;
            }
            tw[W] = carry2;
            // compare
            int cmp = 0;
            for (int k = W; k >= 0 && cmp == 0; --k) {
                if (xw[k] != tw[k]) cmp = xw[k] < tw[k] ? -1 : 1;
            }
            if (cmp >= 0) {
                u128 borrow = 0;
                for (int k = 0; k <= W; ++k) {
                    u128 d = (u128)xw[k] - tw[k] - borrow;
                    xw[k] = (u64)d;
                    borrow = (d >> 64) ? 1 : 0;
                }
                quotient |= (u64)1 << b;
            }
        }
        out[i] = quotient % p;
    }
}

// Compose residues into x mod Q and reduce mod target (e.g. for noise
// meters): out[i] = centered(x) mod target represented in [0, target).
void crt_center_mod(const u64* residues, int L, long long count,
                    const u64* crt_terms, const u64* big_q_words,
                    u64 target, u64* out) {
    Big big_q;
    std::memcpy(big_q.w, big_q_words, sizeof(big_q.w));
    u64 dummy;
    Big half_q = big_div_u64(big_q, 2, &dummy);
    u64 q_mod_t = big_mod_u64(big_q, target);

    for (long long i = 0; i < count; ++i) {
        Big acc = big_zero();
        for (int l = 0; l < L; ++l) {
            Big term;
            std::memcpy(term.w, crt_terms + (size_t)l * W, sizeof(term.w));
            acc = big_add(acc, big_mul_u64(term, residues[(size_t)l * count + i]));
        }
        Big quot = big_div(acc, big_q);
        for (int wi = 0; wi < W; ++wi) {
            if (!quot.w[wi]) continue;
            Big part = big_mul_u64(big_q, quot.w[wi]);
            Big shifted = big_zero();
            for (int k = 0; k + wi < W; ++k) shifted.w[k + wi] = part.w[k];
            acc = big_sub(acc, shifted);
        }
        while (big_cmp(acc, big_q) >= 0) acc = big_sub(acc, big_q);
        u64 r = big_mod_u64(acc, target);
        if (big_cmp(acc, half_q) > 0) {
            // centered negative: (x - Q) mod target
            r = (r + target - q_mod_t % target) % target;
        }
        out[i] = r;
    }
}

}  // extern "C"
