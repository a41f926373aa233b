"""Multi-chip scale-out: mesh construction and ciphertext sharding.

The reference is single-process (rayon threads only — SURVEY.md section 2);
the TPU-native scale story is data parallelism over a `jax.sharding.Mesh`:

* axis "batch"  — ciphertext batch (embarrassingly parallel, shard first);
* axis "limb"   — dBFV digit limbs / RNS primes (shardable; digit-product
  partial sums then reduce over ICI via psum, which XLA inserts
  automatically from the shardings).

All exacto_tpu ops are pure batched tensor programs, so scale-out is purely
a matter of placing NamedShardings on the leading axes and jitting — XLA
inserts the collectives.  Tested on a virtual 8-device CPU mesh
(tests/test_parallel.py) and dry-run-compiled by __graft_entry__.py.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict | None = None, devices=None) -> Mesh:
    """Build a mesh, e.g. make_mesh({"batch": 8}) or {"batch": 4, "limb": 2}."""
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = {"batch": len(devices)}
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes.values())
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh needs {total} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, names)


def _is_narrow_dbfv(tree) -> bool:
    """Narrow dBFV ciphertexts carry the limb axis LEADING ([d, batch, L, n],
    see narrow.NarrowDbfvCiphertext); wide ones carry batch leading."""
    from ..narrow import NarrowDbfvCiphertext

    return isinstance(tree, NarrowDbfvCiphertext)


def batch_spec(tree, mesh: Mesh, axis_name: str = "batch",
               min_batch_ndim: int | None = None):
    """Shardings placing the batch axis of polynomial leaves on `axis_name`.

    Ciphertext pytrees mix batched polynomial data with replicated parameter
    tables (twiddles [L, n], constants [L]); leaves with ndim >=
    min_batch_ndim are treated as batched polys, the rest replicated.
    min_batch_ndim defaults to 3 for BfvCiphertext ([batch, L, n]) and 4 for
    DbfvCiphertext ([batch, d, L, n]) / NarrowDbfvCiphertext ([d, batch, L,
    n] — limb axis leading, so the batch axis is axis 1 there).
    """
    narrow = _is_narrow_dbfv(tree)
    if min_batch_ndim is None:
        from ..dbfv.ciphertext import DbfvCiphertext

        min_batch_ndim = 4 if narrow or isinstance(
            tree, DbfvCiphertext) else 3

    def spec_for(leaf):
        ndim = np.ndim(leaf)
        if ndim >= min_batch_ndim:
            if narrow and ndim >= 4:
                return NamedSharding(
                    mesh, P(None, axis_name, *([None] * (ndim - 2))))
            return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, tree)


def batch_limb_spec(tree, mesh: Mesh, batch_axis: str = "batch",
                    limb_axis: str = "limb"):
    """Shardings for dBFV ciphertexts on a 2D mesh: the ciphertext batch on
    `batch_axis` AND the digit-limb axis on `limb_axis` (wide [batch, d, L,
    n] leaves get P(batch, limb); narrow [d, batch, L, n] leaves get
    P(limb, batch)).  The d^2 digit convolution then reduces partial
    products across the limb axis — XLA lowers that to psum/all-gather over
    ICI, the mesh analogue of the reference's rayon fan-out over digit
    products (dbfv/eval.rs:117)."""
    narrow = _is_narrow_dbfv(tree)

    def spec_for(leaf):
        ndim = np.ndim(leaf)
        if ndim >= 4:
            first, second = ((limb_axis, batch_axis) if narrow
                             else (batch_axis, limb_axis))
            return NamedSharding(
                mesh, P(first, second, *([None] * (ndim - 2))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, tree)


def shard_batch_limb(tree, mesh: Mesh, batch_axis: str = "batch",
                     limb_axis: str = "limb"):
    """Device-put a dBFV ciphertext sharded over batch x limb."""
    return jax.device_put(tree, batch_limb_spec(tree, mesh, batch_axis,
                                                limb_axis))


def replicated_spec(tree, mesh: Mesh):
    """Shardings replicating every leaf (keys, params) across the mesh."""
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), tree)


def shard_batch(tree, mesh: Mesh, axis_name: str = "batch"):
    """Device-put a batched ciphertext pytree sharded over the batch axis."""
    return jax.device_put(tree, batch_spec(tree, mesh, axis_name))


def replicate(tree, mesh: Mesh):
    """Device-put keys/params replicated on every device of the mesh."""
    return jax.device_put(tree, replicated_spec(tree, mesh))
