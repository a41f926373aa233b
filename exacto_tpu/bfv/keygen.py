"""BFV key generation: secret/public/relinearization/Galois keys.

Reference: /root/reference/src/bfv/keygen.rs.  TPU-native changes:

* All gadget-ladder keys are stored STACKED over a leading digit axis
  ([D, L, n] per component) instead of a Vec of pairs, so key switching is
  one batched multiply-accumulate over the digit axis.
* The gadget scalars base^i are precomputed host-side per (digit, prime) —
  replacing the reference's repeated scalar_mul ladder (keygen.rs:134-156).
* Keys are functional pytrees; there is no Drop/zeroize hook (JAX arrays are
  immutable); use `jax.device_get`-free handling and delete references when
  hygiene matters.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from .. import config as _config
from ..params import BfvParams
from ..ring import wordops as w
from ..ring.rns import RnsBasis, RnsPoly, rp_add, rp_mul, rp_neg, rp_automorphism
from ..sampling import sample_gaussian_rns, sample_ternary_rns, sample_uniform_rns


@flax.struct.dataclass
class SecretKey:
    """Ternary secret s in RNS-NTT form (reference keygen.rs:13-26)."""

    poly: RnsPoly
    params: BfvParams

    def destroy(self) -> None:
        """Best-effort key hygiene (the reference zeroizes SecretKey on
        Drop, keygen.rs:19-26).  JAX arrays are immutable, so the buffers
        are FREED immediately instead (jax.Array.delete); later use of the
        key raises a deleted-buffer error — the use-after-drop contract
        at the API level."""
        for buf in jax.tree_util.tree_leaves(self.poly):
            if hasattr(buf, "delete"):
                try:
                    buf.delete()
                except Exception:
                    pass


@flax.struct.dataclass
class PublicKey:
    """pk = (-(a s + e), a) (reference keygen.rs:28-34)."""

    pk0: RnsPoly
    pk1: RnsPoly
    params: BfvParams


@flax.struct.dataclass
class RelinKey:
    """Gadget ladder for s^2: rlk0[i] + rlk1[i]*s = base^i * s^2 + e_i.

    rlk0/rlk1 carry a leading digit axis [D, L, n] (reference keygen.rs:36-45
    stores a Vec of pairs).
    """

    rlk0: RnsPoly
    rlk1: RnsPoly
    params: BfvParams

    @property
    def num_digits(self) -> int:
        return self.rlk0.lo.shape[-3]


@flax.struct.dataclass
class GaloisKey:
    """Key-switch key from s(X^k) to s (reference keygen.rs:47-55)."""

    ks0: RnsPoly
    ks1: RnsPoly
    element: int = flax.struct.field(pytree_node=False)
    params: BfvParams = None


def gen_secret_key(key, params: BfvParams, hamming_weight: int | None = None) -> SecretKey:
    """Ternary secret key; optionally sparse with fixed Hamming weight.

    Sparse ternary secrets (h nonzeros) are the standard bootstrapping
    trick to bound the re-encrypted phase range |c1' * s| <= h * q'/2 — the
    reference has dense ternary only (keygen.rs:64-79); the sparse option is
    an addition used by the bootstrap parameter sets.
    """
    if hamming_weight is None:
        s = sample_ternary_rns(key, params.ct_basis)
    else:
        n = params.ring_degree
        k_pos, k_sign = jax.random.split(key)
        perm = jax.random.permutation(k_pos, n)
        signs = jax.random.rademacher(k_sign, (n,), dtype=jnp.int32)
        mask = (jnp.argsort(perm) < hamming_weight).astype(jnp.int32)
        from ..ring.rns import from_signed_coeffs

        s = from_signed_coeffs(params.ct_basis, signs * mask)
    return SecretKey(poly=s, params=params)


def gen_public_key(key, sk: SecretKey) -> PublicKey:
    params = sk.params
    basis = params.ct_basis
    k_a, k_e = jax.random.split(key)
    a = sample_uniform_rns(k_a, basis)
    e = sample_gaussian_rns(k_e, basis, params.sigma)
    pk0 = rp_neg(basis, rp_add(basis, rp_mul(basis, a, sk.poly), e))
    return PublicKey(pk0=pk0, pk1=a, params=params)


def _gadget_pow_pair(basis: RnsBasis, base: int, num_digits: int):
    """[D, L, 1] Montgomery pair of base^i mod q_j."""
    arr = np.array([[pow(base, i, m) * (1 << 64) % m for m in basis.moduli]
                    for i in range(num_digits)], dtype=object).astype(np.uint64)
    lo, hi = w.to_pair_np(arr)
    return jnp.asarray(lo)[..., None], jnp.asarray(hi)[..., None]


@jax.jit
def _gen_keyswitch_key_jit(key, sk: SecretKey, target: RnsPoly):
    return _gen_keyswitch_key_impl(key, sk, target)


def _gen_keyswitch_key(key, sk, target):
    if _config.jit_enabled():
        return _gen_keyswitch_key_jit(key, sk, target)
    return _gen_keyswitch_key_impl(key, sk, target)


def _gen_keyswitch_key_impl(key, sk: SecretKey, target: RnsPoly):
    """Gadget ladder encrypting `target` under s: ks0[i] = -(a_i s + e_i) + g_i * target."""
    params = sk.params
    basis = params.ct_basis
    D = params.gadget_digits
    k_a, k_e = jax.random.split(key)
    a = sample_uniform_rns(k_a, basis, batch_shape=(D,))
    e = sample_gaussian_rns(k_e, basis, params.sigma, batch_shape=(D,))
    g = _gadget_pow_pair(basis, params.gadget_base, D)  # [D, L, 1]
    g_target = w.mont_mul(target.pair, g, basis.bq(1), basis.bqinv(1))
    g_target_poly = RnsPoly(lo=g_target[0], hi=g_target[1])  # [D, L, n]
    neg_ase = rp_neg(basis, rp_add(basis, rp_mul(basis, a, sk.poly), e))
    ks0 = rp_add(basis, neg_ase, g_target_poly)
    return ks0, a


def gen_relin_key(key, sk: SecretKey) -> RelinKey:
    """Relinearization key for s^2 (reference keygen.rs:117-162)."""
    s_sq = rp_mul(sk.params.ct_basis, sk.poly, sk.poly)
    rlk0, rlk1 = _gen_keyswitch_key(key, sk, s_sq)
    return RelinKey(rlk0=rlk0, rlk1=rlk1, params=sk.params)


def gen_galois_key(key, sk: SecretKey, element: int) -> GaloisKey:
    """Galois key for sigma_element (reference keygen.rs:164-211).

    s(X^k) is computed by the eval-domain permutation (a pure gather) rather
    than the reference's coefficient-domain signed permutation.
    """
    s_auto = rp_automorphism(sk.params.ct_basis, sk.poly, element)
    ks0, ks1 = _gen_keyswitch_key(key, sk, s_auto)
    return GaloisKey(ks0=ks0, ks1=ks1, element=int(element), params=sk.params)


def apply_automorphism_host(coeffs, k: int, q: int):
    """Host-side signed coefficient permutation (reference keygen.rs:218-239)."""
    from ..ring.poly import automorphism_host

    return automorphism_host(coeffs, k, q)
