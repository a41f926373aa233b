"""Parameter system: typed builders with validation and derived constants.

Mirrors /root/reference/src/params/mod.rs (BfvParams, BfvParamsBuilder,
DbfvParams) with TPU-native additions: all per-prime device constants
(twiddles, Montgomery constants, Delta residues) are precomputed here into
pytree fields so that every downstream op is pure tensor code.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.struct

from ..errors import InvalidParam, InvalidRingDegree
from ..ring.rns import RnsBasis
from . import security


@flax.struct.dataclass
class BfvParams:
    """BFV parameter set (reference params/mod.rs:12-27).

    Static fields are hashable Python values (keying jit retraces); pytree
    fields are device-resident precomputed tables.
    """

    # static
    ring_degree: int = flax.struct.field(pytree_node=False)
    plain_modulus: int = flax.struct.field(pytree_node=False)
    moduli: tuple = flax.struct.field(pytree_node=False)
    aux_moduli: tuple = flax.struct.field(pytree_node=False)
    sigma: float = flax.struct.field(pytree_node=False)
    gadget_base: int = flax.struct.field(pytree_node=False)
    gadget_digits: int = flax.struct.field(pytree_node=False)

    # pytree
    ct_basis: RnsBasis = None
    aux_basis: Optional[RnsBasis] = None
    delta_mont: tuple = None  # [L] Montgomery pair: Delta mod q_i

    @property
    def big_q(self) -> int:
        q = 1
        for m in self.moduli:
            q *= m
        return q

    @property
    def big_p_aux(self) -> int:
        p = 1
        for m in self.aux_moduli:
            p *= m
        return p

    @property
    def delta(self) -> int:
        """Delta = floor(Q / p) (reference encrypt.rs:204-229)."""
        return self.big_q // self.plain_modulus


class BfvParamsBuilder:
    """Fluent builder with validation (reference params/mod.rs:30-124)."""

    def __init__(self):
        self._ring_degree = 4096
        self._plain_modulus = 65537
        self._ct_moduli: list[int] = []
        self._aux_moduli: list[int] = []
        self._sigma = 3.2
        self._gadget_base = 0  # 0 = auto (2^16)
        self._min_security_bits: float | None = None

    def ring_degree(self, n: int):
        self._ring_degree = int(n)
        return self

    def plain_modulus(self, p: int):
        self._plain_modulus = int(p)
        return self

    def ct_moduli(self, moduli):
        self._ct_moduli = [int(m) for m in moduli]
        return self

    def aux_moduli(self, moduli):
        self._aux_moduli = [int(m) for m in moduli]
        return self

    def sigma(self, sigma: float):
        self._sigma = float(sigma)
        return self

    def gadget_base(self, base: int):
        self._gadget_base = int(base)
        return self

    def min_security_bits(self, bits: float):
        """Enforce the security estimate at build time.

        The reference ships an estimator but never wires it in
        (SURVEY.md quirk list); here enforcement is opt-in.
        """
        self._min_security_bits = float(bits)
        return self

    def build(self) -> BfvParams:
        n = self._ring_degree
        if n < 2 or n & (n - 1):
            raise InvalidRingDegree(n)
        if not self._ct_moduli:
            raise InvalidParam("must specify at least one ciphertext modulus")
        if self._plain_modulus < 2:
            raise InvalidParam("plaintext modulus must be >= 2")

        ct_basis = RnsBasis.create(self._ct_moduli, n)
        aux_basis = RnsBasis.create(self._aux_moduli, n) if self._aux_moduli else None

        big_q = 1
        for m in self._ct_moduli:
            big_q *= m
        if big_q < self._plain_modulus:
            raise InvalidParam("ciphertext modulus product Q must be >= plaintext modulus p")

        base = self._gadget_base if self._gadget_base else 1 << 16
        if base < 2 or base & (base - 1):
            raise InvalidParam(
                "gadget base must be a power of two >= 2 (device digit extraction)")
        # match the reference's while-loop digit count (params/mod.rs:126-140)
        digits = 0
        pow_ = 1
        while pow_ < big_q:
            pow_ *= base
            digits += 1
        digits = max(digits, 1)

        if self._min_security_bits is not None:
            est = security.estimate_security_bits(n, math.log2(big_q), self._sigma)
            if est < self._min_security_bits:
                raise InvalidParam(
                    f"estimated security {est:.1f} bits < required "
                    f"{self._min_security_bits}")

        delta = big_q // self._plain_modulus
        delta_mont = ct_basis.mont_scalar_pair([delta % m for m in self._ct_moduli])

        return BfvParams(
            ring_degree=n,
            plain_modulus=self._plain_modulus,
            moduli=tuple(self._ct_moduli),
            aux_moduli=tuple(self._aux_moduli),
            sigma=self._sigma,
            gadget_base=base,
            gadget_digits=digits,
            ct_basis=ct_basis,
            aux_basis=aux_basis,
            delta_mont=delta_mont,
        )


@flax.struct.dataclass
class DbfvParams:
    """dBFV parameter set (reference params/mod.rs:142-193).

    plain_modulus == 0 is the sentinel for p = 2^64 (full u64 range), same
    convention as the reference.
    """

    base: int = flax.struct.field(pytree_node=False)
    num_digits: int = flax.struct.field(pytree_node=False)
    plain_modulus: int = flax.struct.field(pytree_node=False)
    bfv_params: BfvParams = None

    @classmethod
    def create(cls, bfv_params: BfvParams, base: int, num_digits: int,
               plain_modulus: int) -> "DbfvParams":
        if base < 2:
            raise InvalidParam("base must be >= 2")
        if num_digits < 1:
            raise InvalidParam("num_digits must be >= 1")
        p = (1 << 64) if plain_modulus == 0 else plain_modulus
        if base ** num_digits < p:
            raise InvalidParam(
                f"base^digits = {base ** num_digits} < plain_modulus = {p}")
        return cls(base=int(base), num_digits=int(num_digits),
                   plain_modulus=int(plain_modulus), bfv_params=bfv_params)

    @property
    def effective_plain_modulus(self) -> int:
        return (1 << 64) if self.plain_modulus == 0 else self.plain_modulus
