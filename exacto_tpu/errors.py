"""Error types for exacto_tpu.

Mirrors the reference error surface (/root/reference/src/error.rs) as a Python
exception hierarchy: one base class so callers can catch everything, plus one
subclass per reference variant.
"""

from __future__ import annotations


class ExactoError(Exception):
    """Base class for all exacto_tpu errors."""


class InvalidParam(ExactoError):
    """Invalid parameter (reference: ExactoError::InvalidParam)."""


class DimensionMismatch(ExactoError):
    """Dimension mismatch (reference: ExactoError::DimensionMismatch)."""

    def __init__(self, expected, got):
        super().__init__(f"dimension mismatch: expected {expected}, got {got}")
        self.expected = expected
        self.got = got


class ModulusMismatch(ExactoError):
    """Modulus mismatch (reference: ExactoError::ModulusMismatch)."""


class InvalidRingDegree(ExactoError):
    """Ring degree must be a power of 2 (reference: ExactoError::InvalidRingDegree)."""

    def __init__(self, n):
        super().__init__(f"ring degree must be a power of 2, got {n}")
        self.n = n


class DecryptionError(ExactoError):
    """Noise budget exhausted (reference: ExactoError::DecryptionError)."""


class DecompositionError(ExactoError):
    """Digit decomposition error (reference: ExactoError::DecompositionError)."""


class LatticeError(ExactoError):
    """Carry-lattice error (reference: ExactoError::LatticeError)."""


class MissingKey(ExactoError):
    """Required key not available (reference: ExactoError::MissingKey)."""


class NotImplementedYet(ExactoError):
    """Feature not implemented (reference: ExactoError::NotImplemented)."""
