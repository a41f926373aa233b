"""Multi-host scale-out: DCN-aware meshes and key distribution.

The reference is single-process (rayon threads on one box — SURVEY.md
section 2); its only scale axis is core count.  The TPU-native multi-host
story has two network tiers with ~100x different bandwidth:

* ICI — the intra-slice torus.  Collective-heavy axes (the dBFV limb axis,
  whose digit-product partial sums psum/all-gather every multiply) MUST
  ride here.
* DCN — the data-center network between slices/hosts.  Only embarrassingly
  parallel axes (the ciphertext batch) should cross it: with the batch on
  DCN the compiled program has NO cross-slice collectives at all, so the
  slow network carries zero steady-state traffic.

`dcn_mesh` encodes that rule by construction: the DCN axis is the
OUTERMOST mesh axis and groups whole slices, so `batch_limb_spec(...,
batch_axis="dcn")` places the batch across slices and the limb axis on
ICI.  This is the standard megascale recipe (scaling-book's
data-parallel-outer / model-parallel-inner) applied to HE ciphertexts.

Key distribution: every host needs identical evaluation keys (relin,
Galois, bootstrap).  Sampling them independently per process would
produce garbage — keys are secret-correlated random objects.  The
protocol here is generate-once / broadcast: process 0 generates (or
loads) the keys, `distribute_keys` broadcasts the host-local arrays over
DCN and device_puts them replicated on the mesh.  For offline
distribution the same pytrees round-trip through
utils/serialization.save_pytree (a .npz any host can load).

Single-process boxes (this image, CI) exercise the same code paths: the
broadcast is the identity when process_count() == 1, and the mesh
builder accepts a simulated slice structure so the 8-device CPU mesh
tests the 2-slice x 4-device layout end to end (tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from . import replicate


def _device_slice_index(dev) -> int:
    """Slice id of a device: TPU pods expose .slice_index; single-slice
    backends (CPU, one-chip axon) report 0."""
    return int(getattr(dev, "slice_index", 0) or 0)


def dcn_mesh(ici_axes: dict | None = None, dcn_axis: str = "batch",
             num_slices: int | None = None, devices=None) -> Mesh:
    """Mesh with the DCN (cross-slice) axis outermost and ICI axes inner.

    ici_axes: name -> size for the intra-slice axes (e.g. {"limb": 4});
    their product must equal the per-slice device count.  Default: one
    "limb" axis covering the whole slice.

    num_slices: simulate a slice structure on backends without one (CPU
    tests: 8 devices + num_slices=2 -> a [2, 4] mesh whose outer axis
    stands in for DCN).  On real multi-slice TPU the grouping comes from
    device.slice_index and num_slices must match it if given.
    """
    if devices is None:
        devices = jax.devices()
    by_slice: dict[int, list] = {}
    for d in devices:
        by_slice.setdefault(_device_slice_index(d), []).append(d)
    if len(by_slice) > 1:
        # real multi-slice topology — honor it
        if num_slices is not None and num_slices != len(by_slice):
            raise ValueError(
                f"num_slices={num_slices} but topology has {len(by_slice)}")
        groups = [by_slice[k] for k in sorted(by_slice)]
    else:
        n = num_slices or 1
        if len(devices) % n:
            raise ValueError(
                f"{len(devices)} devices do not split into {n} slices")
        per = len(devices) // n
        groups = [list(devices[i * per:(i + 1) * per]) for i in range(n)]
    per_slice = len(groups[0])
    if any(len(g) != per_slice for g in groups):
        raise ValueError("slices are unequal; pass an explicit device list")
    if ici_axes is None:
        ici_axes = {"limb": per_slice}
    ici_total = int(np.prod(list(ici_axes.values()))) if ici_axes else 1
    if ici_total != per_slice:
        raise ValueError(
            f"ici axes {ici_axes} need {ici_total} devices/slice, "
            f"slice has {per_slice}")
    dev_array = np.asarray(
        [g[:ici_total] for g in groups], dtype=object).reshape(
        (len(groups),) + tuple(ici_axes.values()))
    return Mesh(dev_array, (dcn_axis,) + tuple(ici_axes))


def dcn_axis_name(mesh: Mesh) -> str:
    """The cross-slice axis of a dcn_mesh (outermost by construction)."""
    return mesh.axis_names[0]


def distribute_keys(keys_tree, mesh: Mesh, source_process: int = 0):
    """Replicate evaluation keys generated on ONE process to every host.

    process 0 (or `source_process`) holds the generated keys; other
    processes pass a pytree of the same structure/shapes (e.g. built with
    jnp.zeros_like placeholders, or loaded metadata-only).  The host-local
    arrays are broadcast over DCN, then device_put replicated on `mesh`.
    Single-process: the broadcast is the identity and this is exactly
    parallel.replicate.
    """
    if jax.process_count() > 1:  # pragma: no cover - needs a real pod
        from jax.experimental import multihost_utils

        leaves, treedef = jax.tree_util.tree_flatten(keys_tree)
        host_leaves = [np.asarray(x) for x in leaves]
        synced = multihost_utils.broadcast_one_to_all(
            host_leaves, is_source=jax.process_index() == source_process)
        keys_tree = jax.tree_util.tree_unflatten(treedef, synced)
    return replicate(keys_tree, mesh)


def save_keys_for_hosts(path: str, keys_tree, meta: dict | None = None):
    """Offline key distribution: serialize the key pytree to an .npz every
    host can load (utils/serialization.save_pytree) before calling
    distribute_keys on the loaded copy."""
    from ..utils.serialization import save_pytree

    save_pytree(path, keys_tree, meta=meta)
