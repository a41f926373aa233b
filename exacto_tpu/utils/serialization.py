"""Key / ciphertext / params serialization (npz-based).

The reference declares a serde feature but never derives it on any type
(SURVEY.md section 5 — effectively unimplemented); multi-host deployment
needs real serialization, so this provides it: any exacto_tpu pytree whose
static structure is reconstructible from params can round-trip through a
single .npz file plus a JSON header.
"""

from __future__ import annotations

import io
import json

import jax
import numpy as np

from ..params import BfvParams, BfvParamsBuilder, DbfvParams


def params_to_dict(params: BfvParams) -> dict:
    return {
        "ring_degree": params.ring_degree,
        "plain_modulus": params.plain_modulus,
        "ct_moduli": list(params.moduli),
        "aux_moduli": list(params.aux_moduli),
        "sigma": params.sigma,
        "gadget_base": params.gadget_base,
    }


def params_from_dict(d: dict) -> BfvParams:
    b = (BfvParamsBuilder()
         .ring_degree(d["ring_degree"])
         .plain_modulus(d["plain_modulus"])
         .ct_moduli(d["ct_moduli"])
         .sigma(d["sigma"])
         .gadget_base(d["gadget_base"]))
    if d["aux_moduli"]:
        b = b.aux_moduli(d["aux_moduli"])
    return b.build()


def dbfv_params_to_dict(params: DbfvParams) -> dict:
    return {
        "bfv": params_to_dict(params.bfv_params),
        "base": params.base,
        "num_digits": params.num_digits,
        "plain_modulus": params.plain_modulus,
    }


def dbfv_params_from_dict(d: dict) -> DbfvParams:
    return DbfvParams.create(params_from_dict(d["bfv"]), d["base"],
                             d["num_digits"], d["plain_modulus"])


def save_pytree(path: str, tree, meta: dict | None = None):
    """Save any jax pytree of arrays to an .npz, with a JSON metadata entry.

    The treedef is stored as a string for validation at load time; the caller
    is responsible for reconstructing static structure (usually by rebuilding
    params via params_from_dict and using `load_pytree_like`).
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    header = json.dumps({"treedef": str(treedef), "meta": meta or {}})
    arrays["__header__"] = np.frombuffer(header.encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_pytree_like(path: str, example):
    """Load arrays saved by save_pytree into the structure of `example`.

    `example` supplies the pytree structure (e.g. a freshly generated key of
    the same params); leaf count and treedef string are validated.
    """
    with np.load(path) as data:
        header = json.loads(bytes(data["__header__"]).decode())
        leaves = [data[f"leaf_{i}"]
                  for i in range(len(data.files) - 1)]
    ex_leaves, treedef = jax.tree_util.tree_flatten(example)
    if len(leaves) != len(ex_leaves):
        raise ValueError(
            f"leaf count mismatch: file has {len(leaves)}, example has {len(ex_leaves)}")
    if header["treedef"] != str(treedef):
        raise ValueError("pytree structure mismatch between file and example")
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(treedef, [jnp.asarray(x) for x in leaves])


def load_meta(path: str) -> dict:
    with np.load(path) as data:
        header = json.loads(bytes(data["__header__"]).decode())
    return header["meta"]
