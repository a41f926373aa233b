"""One-command diff of a Rust-reference dump against the frozen vectors.

Closes the last mechanical step of SURVEY item 41 (bit-exact parity vs the
reference RNG).  The Rust side cannot run in this environment (no
rustc/cargo); when it CAN run somewhere, the dump generator is ALREADY
WRITTEN: copy `tools/dump_parity.rs` into the reference crate as
`examples/dump_parity.rs`, `cargo run --release --example dump_parity --
<dir>`, then diff here with `--rust-dump <dir>`.

Dump recipe the generator implements:
  1. `let mut rng = ChaCha20Rng::seed_from_u64(42);`  (rand_chacha 0.9)
  2. per preset (compact_bfv, small_bfv, compact_dbfv, u64_dbfv), drawing
     from that ONE stream in this exact order:
       sk  = gen_secret_key_with_rng(&mut rng, &params)
       pk  = gen_public_key_with_rng(&mut rng, &sk)
       ct_sk = encrypt_sk_with_rng(&mut rng, &encode_scalar(123), &sk)
       ct_pk = encrypt_pk_with_rng(&mut rng, &encode_scalar(77), &pk)
       (dbfv presets) dct = dbfv_encrypt_with_rng(&mut rng, VALUE, &pk)
         VALUE: compact_dbfv = 200, u64_dbfv = 0x0123456789ABCDEF
     (reference seams: /root/reference/src/bfv/keygen.rs:58-66,
      /root/reference/src/bfv/encrypt.rs:29, dbfv/encrypt.rs:27)
  3. for each object, inverse-NTT every RnsPoly component and write the
     coefficient-domain residues as little-endian u64, C-contiguous, one
     file per key:
        <dump_dir>/<preset>__<key>.bin
     keys and shapes exactly as in tests/fixtures/parity_vectors.json:
        sk_coeffs [n] (raw ternary sampler output at q0 — also equals the
                       sk component at prime 0)
        pk0, pk1, ct_sk_c0, ct_sk_c1, ct_pk_c0, ct_pk_c1  [L, n]
        dbfv_c0, dbfv_c1  [d, L, n]  (limb-major)
     `.npy` files of dtype uint64 with the same names are also accepted.

Usage:
    python tools/diff_parity_vectors.py --rust-dump DIR [--preset NAME]

Exit code 0 iff every present key matches bit-exactly; missing keys are
reported but do not fail the diff (partial dumps are fine while iterating).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE_DIR = os.path.join(HERE, "..", "tests", "fixtures")


def load_dump_array(dump_dir: str, name: str, shape) -> np.ndarray | None:
    """<preset>__<key> as .npy or raw little-endian u64 .bin (reshaped)."""
    npy = os.path.join(dump_dir, name + ".npy")
    if os.path.exists(npy):
        return np.asarray(np.load(npy), dtype=np.uint64)
    binp = os.path.join(dump_dir, name + ".bin")
    if os.path.exists(binp):
        raw = np.fromfile(binp, dtype="<u8")
        want = int(np.prod(shape))
        if raw.size != want:
            raise SystemExit(
                f"{binp}: {raw.size} u64 words, manifest shape {shape} "
                f"needs {want}")
        return raw.reshape(shape)
    # nested layout <preset>/<key> also accepted
    alt = os.path.join(dump_dir, *name.split("__"))
    for ext, loader in ((".npy", lambda p: np.load(p)),
                        (".bin", lambda p: np.fromfile(p, dtype="<u8")
                         .reshape(shape))):
        if os.path.exists(alt + ext):
            return np.asarray(loader(alt + ext), dtype=np.uint64)
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rust-dump", required=True,
                    help="directory with <preset>__<key>.{bin,npy} files")
    ap.add_argument("--preset", default=None,
                    help="restrict to one preset (e.g. u64_dbfv)")
    args = ap.parse_args()

    with open(os.path.join(FIXTURE_DIR, "parity_vectors.json")) as f:
        manifest = json.load(f)
    frozen = np.load(os.path.join(FIXTURE_DIR, "parity_vectors.npz"))

    n_ok = n_bad = n_missing = 0
    for key, meta in sorted(manifest["digests"].items()):
        preset, field = key.split("/", 1)
        if args.preset and preset != args.preset:
            continue
        ours = frozen[key]
        assert hashlib.sha256(
            np.ascontiguousarray(ours).tobytes()).hexdigest() \
            == meta["sha256"], f"fixture digest drift on {key}"
        theirs = load_dump_array(args.rust_dump, f"{preset}__{field}",
                                 meta["shape"])
        if theirs is None:
            print(f"MISSING  {key}  (expected shape {meta['shape']})")
            n_missing += 1
            continue
        if theirs.shape != ours.shape:
            print(f"FAIL     {key}  shape {list(theirs.shape)} != "
                  f"{meta['shape']}")
            n_bad += 1
            continue
        if np.array_equal(theirs, ours):
            print(f"ok       {key}")
            n_ok += 1
        else:
            diff = np.argwhere(theirs != ours)
            i = tuple(diff[0])
            print(f"FAIL     {key}  {diff.shape[0]} mismatching words; "
                  f"first at {i}: theirs={theirs[i]} ours={ours[i]}")
            n_bad += 1

    print(f"\n{n_ok} ok, {n_bad} fail, {n_missing} missing "
          f"(seed={manifest['seed']})")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
