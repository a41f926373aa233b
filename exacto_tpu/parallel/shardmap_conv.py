"""Explicit-collective digit convolution: shard_map over the limb axis.

Round-2 verdict item 7 (the last SURVEY §2-table row with no code): the
d² digit-product fan-out of dbfv_mul (reference: rayon par_iter,
/root/reference/src/dbfv/eval.rs:104-136) as an EXPLICIT shard_map program
over a mesh "limb" axis, instead of relying on XLA's sharding propagation.

Pattern (the all-gather + local-partials form of a systolic convolution):
  * the four input tensors arrive limb-sharded [d_loc, ..., L, n] per
    device (d_loc = d / mesh.shape[limb]);
  * each device `all_gather`s the counterparty limbs over ICI (tiled, so
    the gather is d_loc -> d rows);
  * each device computes ONLY its own output limbs k in
    [idx*d_loc, (idx+1)*d_loc): out[k] = sum_{i+j=k} a_i * b_j — the
    anti-diagonal partial sums stay device-local, so no psum is needed on
    the output (the reduction over the digit grid happens inside the local
    loop; work is balanced to d^2-ish/devices products per device after
    truncation).
  * outputs leave limb-sharded with the SAME layout the rest of the narrow
    engine expects ([d, ..., L, n] leading limb axis).

Scope: p = b^d profiles (both u64 presets), where degree reduction is a
pure truncation (SmallReps all zero) and the conv output is exactly d
limbs — the general-reps fold would need the 2d-1 tail limbs gathered.

Equivalence-tested against the single-program jnp path and timed relative
to the auto-propagated sharding on the 8-device CPU mesh
(tests/test_parallel.py::test_shardmap_conv_*).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ring import wordops32 as w32


def _local_truncated_tensor3(a0, a1, b0, b1, q, qi, d, d_loc, idx):
    """Anti-diagonal sums for output limbs [idx*d_loc, (idx+1)*d_loc) of
    the three degree-2 tensor components; inputs are the FULL gathered
    [d, ..., L, n] tensors, outputs [d_loc, ..., L, n]."""
    s0 = w32.mod_add32(a0, a1, q)
    s1 = w32.mod_add32(b0, b1, q)
    outs0, outs1, outs2 = [], [], []
    for k_loc in range(d_loc):
        k = idx * d_loc + k_loc
        acc0 = acc2 = accm = None
        for i in range(d):
            j = k - i
            if j < 0 or j >= d:
                continue
            p0 = w32.mont_mul32(a0[i], b0[j], q, qi)
            p2 = w32.mont_mul32(a1[i], b1[j], q, qi)
            pm = w32.mont_mul32(s0[i], s1[j], q, qi)
            if acc0 is None:
                acc0, acc2, accm = p0, p2, pm
            else:
                acc0 = w32.mod_add32(acc0, p0, q)
                acc2 = w32.mod_add32(acc2, p2, q)
                accm = w32.mod_add32(accm, pm, q)
        outs0.append(acc0)
        outs2.append(acc2)
        outs1.append(w32.mod_sub32(w32.mod_sub32(accm, acc0, q), acc2, q))
    return (jnp.stack(outs0), jnp.stack(outs1), jnp.stack(outs2))


def tensor3_conv_shardmap(a0, a1, b0, b1, moduli, mesh,
                          limb_axis: str = "limb"):
    """(t0, t1, t2) truncated digit convolution with the limb axis sharded
    on `mesh[limb_axis]`; inputs/outputs [d, ..., L, n] eval-Montgomery.

    Collectives: 4 tiled all_gathers over the limb axis per call (b/f the
    anti-diagonal partials are computed device-locally — see module doc)."""
    d = a0.shape[0]
    n_dev = mesh.shape[limb_axis]
    if d % n_dev:
        raise ValueError(f"d={d} not divisible by limb axis size {n_dev}")
    d_loc = d // n_dev
    q = jnp.asarray(np.array(moduli, dtype=np.uint32)).reshape(-1, 1)
    qi = jnp.asarray(np.array(
        [w32.mont_consts32(m)["qinv_neg"] for m in moduli],
        dtype=np.uint32)).reshape(-1, 1)
    ndim = a0.ndim
    spec = P(limb_axis, *([None] * (ndim - 1)))

    def body(a0s, a1s, b0s, b1s):
        idx = jax.lax.axis_index(limb_axis)
        ga0 = jax.lax.all_gather(a0s, limb_axis, axis=0, tiled=True)
        ga1 = jax.lax.all_gather(a1s, limb_axis, axis=0, tiled=True)
        gb0 = jax.lax.all_gather(b0s, limb_axis, axis=0, tiled=True)
        gb1 = jax.lax.all_gather(b1s, limb_axis, axis=0, tiled=True)
        # idx is traced; unroll over the possible device positions with a
        # switch so each branch's anti-diagonal loop stays static
        branches = [partial(_local_truncated_tensor3, d=d, d_loc=d_loc,
                            idx=i) for i in range(n_dev)]
        return jax.lax.switch(idx, branches, ga0, ga1, gb0, gb1, q, qi)

    fn = jax.shard_map(body, mesh=mesh, in_specs=(spec,) * 4,
                       out_specs=(spec,) * 3, check_vma=False)
    return fn(a0, a1, b0, b1)


def conv_shardings(mesh, ndim: int, limb_axis: str = "limb"):
    """NamedShardings matching tensor3_conv_shardmap's in/out layout."""
    return NamedSharding(mesh, P(limb_axis, *([None] * (ndim - 1))))
