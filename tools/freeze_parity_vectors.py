"""Freeze golden parity vectors: (seed, params) -> expected residues.

The reference exposes `_with_rng` seams (/root/reference/src/bfv/encrypt.rs:29,
keygen.rs:58-66) precisely so fixed-seed vectors can be produced.  This tool
runs exacto_tpu's reference-order ChaCha20 pipeline (exacto_tpu/parity.py)
for every preset at seed 42 and writes `tests/fixtures/parity_vectors.npz`
plus a digest manifest `tests/fixtures/parity_vectors.json`.

A future run of the Rust reference is then a one-command diff: seed
`ChaCha20Rng::seed_from_u64(42)`, generate the same objects in the same
order, dump coefficient-domain residues, and compare to the npz (or just
the SHA256 digests in the json).

Object order per preset (one continuous RNG stream, seed 42):
  1. sk        <- gen_secret_key_with_rng          -> sk ternary coeffs at q0
  2. pk        <- gen_public_key_with_rng          -> pk0/pk1 residues [L, n]
  3. ct_sk     <- encrypt_sk_with_rng(msg=123)     -> c0/c1 residues [L, n]
  4. ct_pk     <- encrypt_pk_with_rng(msg=77)      -> c0/c1 residues [L, n]
  5. (dbfv presets) dbfv_ct <- dbfv_encrypt_with_rng(value) ->
     per-limb c0/c1 residues [d, L, n]
     (u64_dbfv: value = 0x0123456789ABCDEF; compact_dbfv: value = 200)

Residues are coefficient-domain standard form (the INTT of the engine's
NTT-Montgomery tensors), as u64 arrays — byte-identical to what the Rust
reference's `RnsPoly` components hold after an inverse NTT.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests",
                           "fixtures")
SEED = 42
MSG_SK = 123
MSG_PK = 77
DBFV_VALUES = {"compact_dbfv": 200, "u64_dbfv": 0x0123456789ABCDEF}


def build_vectors():
    import jax

    # the axon TPU plugin latches jax_platforms via sitecustomize; force CPU
    # at runtime so vector generation never waits on the device tunnel
    jax.config.update("jax_platforms", "cpu")
    from exacto_tpu import parity
    from exacto_tpu.bfv.encoding import Plaintext
    from exacto_tpu.params.presets import (compact_bfv, compact_dbfv,
                                           small_bfv, u64_dbfv)
    from exacto_tpu.ring.rns import to_u64_host

    presets = {
        "compact_bfv": (compact_bfv(), None),
        "small_bfv": (small_bfv(), None),
        "compact_dbfv": (compact_dbfv().bfv_params, compact_dbfv()),
        "u64_dbfv": (u64_dbfv().bfv_params, u64_dbfv()),
    }
    out = {}
    for name, (params, dparams) in presets.items():
        n = params.ring_degree
        q0 = params.ct_basis.moduli[0]
        rng = parity.ChaCha20Rng.seed_from_u64(SEED)
        # sk coeffs are re-derived from the same stream position the builder
        # consumes, so the fixture pins the raw sampler output too
        rng_probe = parity.ChaCha20Rng.seed_from_u64(SEED)
        sk_coeffs = parity.sample_ternary_poly(n, q0, rng_probe)
        sk = parity.gen_secret_key_with_rng(rng, params)
        pk = parity.gen_public_key_with_rng(rng, sk)
        pt_sk = Plaintext(coeffs=np.array([MSG_SK % params.plain_modulus]
                                          + [0] * (n - 1), dtype=np.uint64),
                          modulus=params.plain_modulus)
        ct_sk = parity.encrypt_sk_with_rng(rng, pt_sk, sk)
        pt_pk = Plaintext(coeffs=np.array([MSG_PK % params.plain_modulus]
                                          + [0] * (n - 1), dtype=np.uint64),
                          modulus=params.plain_modulus)
        ct_pk = parity.encrypt_pk_with_rng(rng, pt_pk, pk)

        basis = params.ct_basis
        rec = {
            "sk_coeffs": np.asarray(sk_coeffs, dtype=np.uint64),
            "pk0": to_u64_host(basis, pk.pk0),
            "pk1": to_u64_host(basis, pk.pk1),
            "ct_sk_c0": to_u64_host(basis, ct_sk.c[0]),
            "ct_sk_c1": to_u64_host(basis, ct_sk.c[1]),
            "ct_pk_c0": to_u64_host(basis, ct_pk.c[0]),
            "ct_pk_c1": to_u64_host(basis, ct_pk.c[1]),
        }
        if dparams is not None:
            dct = parity.dbfv_encrypt_with_rng(rng, DBFV_VALUES[name], pk,
                                               dparams)
            rec["dbfv_c0"] = to_u64_host(basis, dct.limbs.c[0])
            rec["dbfv_c1"] = to_u64_host(basis, dct.limbs.c[1])
        out[name] = rec
    return out


def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    vectors = build_vectors()
    flat = {}
    manifest = {"seed": SEED, "msg_sk": MSG_SK, "msg_pk": MSG_PK,
                "dbfv_values": {k: str(v) for k, v in DBFV_VALUES.items()},
                "digests": {}}
    for preset, rec in vectors.items():
        for key, arr in rec.items():
            arr = np.ascontiguousarray(np.asarray(arr, dtype=np.uint64))
            flat[f"{preset}/{key}"] = arr
            manifest["digests"][f"{preset}/{key}"] = {
                "shape": list(arr.shape),
                "sha256": hashlib.sha256(arr.tobytes()).hexdigest(),
            }
    npz_path = os.path.join(FIXTURE_DIR, "parity_vectors.npz")
    np.savez_compressed(npz_path, **flat)
    with open(os.path.join(FIXTURE_DIR, "parity_vectors.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"wrote {npz_path} ({os.path.getsize(npz_path)} bytes, "
          f"{len(flat)} arrays)")


if __name__ == "__main__":
    sys.exit(main())
