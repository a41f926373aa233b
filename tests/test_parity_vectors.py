"""Golden parity vectors: regenerate the reference-order ChaCha20 pipeline
and assert bit-exactness against the committed fixtures.

The fixtures (tests/fixtures/parity_vectors.npz, produced by
tools/freeze_parity_vectors.py) pin (seed, params) -> residues for all four
presets so a future run of the Rust reference with
`ChaCha20Rng::seed_from_u64(42)` is a one-command diff
(/root/reference/src/bfv/encrypt.rs:29 seams).  These tests guard the
fixtures against regressions in exacto_tpu's own pipeline.
"""

import hashlib
import json
import os

import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def fixtures():
    path = os.path.join(FIXDIR, "parity_vectors.npz")
    if not os.path.exists(path):
        pytest.fail("fixtures missing - run tools/freeze_parity_vectors.py")
    return np.load(path)


def test_manifest_digests_match_npz(fixtures):
    with open(os.path.join(FIXDIR, "parity_vectors.json")) as f:
        manifest = json.load(f)
    assert manifest["seed"] == 42
    for key, meta in manifest["digests"].items():
        arr = np.ascontiguousarray(fixtures[key])
        assert list(arr.shape) == meta["shape"], key
        assert hashlib.sha256(arr.tobytes()).hexdigest() == meta["sha256"], key


@pytest.fixture(scope="module")
def regenerated():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import freeze_parity_vectors as fz

    return fz.build_vectors()


@pytest.mark.slow
@pytest.mark.parametrize("preset", ["compact_bfv", "small_bfv",
                                    "compact_dbfv", "u64_dbfv"])
@pytest.mark.slow
def test_pipeline_reproduces_fixtures(fixtures, regenerated, preset):
    rec = regenerated[preset]
    for key, arr in rec.items():
        want = fixtures[f"{preset}/{key}"]
        np.testing.assert_array_equal(
            np.asarray(arr, dtype=np.uint64), want,
            err_msg=f"{preset}/{key} diverged from the frozen golden vector")
