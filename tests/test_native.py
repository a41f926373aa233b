"""Native C++ CRT kernels vs the Python-int oracle."""

import numpy as np
import pytest

from exacto_tpu import native
from exacto_tpu.ring import hostmath as hm


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native kernels unavailable")


CASES = [
    ([1099509805057], 257),
    ([1152921504606830593], 1040407),
    ([65537, 1099509805057], 257),
    ([1125899906842817, 1125899906843009, 1125899906843233], 97),
    ([1125899906842817, 1125899906843009, 1125899906843233, 1125899906843617], 97),
]


@pytest.mark.parametrize("moduli,p", CASES)
def test_crt_round_scale_matches_python(moduli, p, rng):
    L, n, batch = len(moduli), 32, 3
    big_q = 1
    for m in moduli:
        big_q *= m
    res = np.zeros((batch, L, n), dtype=np.uint64)
    for b in range(batch):
        for li, m in enumerate(moduli):
            res[b, li] = rng.integers(0, m, n, dtype=np.uint64)

    got = native.crt_round_scale(res, moduli, p)

    half_q = big_q >> 1
    for b in range(batch):
        for j in range(n):
            x = hm.crt_reconstruct([int(res[b, li, j]) for li in range(L)], moduli)
            want = ((x * p + half_q) // big_q) % p
            assert int(got[b, j]) == want, (b, j)


@pytest.mark.parametrize("moduli,p", CASES[:3])
def test_crt_center_mod_matches_python(moduli, p, rng):
    L, n = len(moduli), 16
    big_q = 1
    for m in moduli:
        big_q *= m
    res = np.zeros((L, n), dtype=np.uint64)
    for li, m in enumerate(moduli):
        res[li] = rng.integers(0, m, n, dtype=np.uint64)
    target = 1 << 40
    got = native.crt_center_mod(res, moduli, target)
    for j in range(n):
        x = hm.crt_reconstruct([int(res[li, j]) for li in range(L)], moduli)
        if x > big_q // 2:
            x -= big_q
        assert int(got[j]) == x % target, j
