"""Multi-host (DCN-aware) scale-out tests on the virtual 8-device CPU mesh.

The 8 conftest devices simulate a 2-slice x 4-device pod: the outer mesh
axis stands in for DCN, the inner for ICI.  The invariants tested are the
ones that make the layout production-correct on a real pod:

* the DCN axis is outermost (slowest-varying device index), so whole
  simulated slices own contiguous batch shards;
* batch-only sharding across the DCN axis compiles to ZERO collectives —
  the slow network carries no steady-state traffic;
* the 2D (batch-on-DCN x limb-on-ICI) multiply is bit-identical to the
  local path;
* key distribution replicates one generated key set everywhere, both the
  in-memory broadcast path and the offline save/load path.
"""

import numpy as np
import jax
import pytest

from exacto_tpu import narrow as nr
from exacto_tpu.parallel import batch_limb_spec, batch_spec, shard_batch
from exacto_tpu.parallel.multihost import (
    dcn_axis_name, dcn_mesh, distribute_keys, save_keys_for_hosts)

_COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
                "reduce-scatter", "all-to-all")


def _tiny_narrow():
    n = 16
    qs = nr.find_narrow_primes(n, 2, 31)
    ps = nr.find_narrow_primes(n, 4, 29, skip=qs)
    bfv = nr.NarrowParams.create(n, 1040407, qs, ps, gadget_base=256)
    return nr.NarrowDbfvParams(base=256, num_digits=8, plain_modulus=0,
                               bfv=bfv)


def test_dcn_mesh_layout():
    mesh = dcn_mesh({"limb": 4}, num_slices=2)
    assert mesh.axis_names == ("batch", "limb")
    assert mesh.shape == {"batch": 2, "limb": 4}
    assert dcn_axis_name(mesh) == "batch"
    # DCN axis outermost: slice 0 owns devices 0-3, slice 1 owns 4-7
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    assert ids[0].tolist() == [0, 1, 2, 3]
    assert ids[1].tolist() == [4, 5, 6, 7]
    with pytest.raises(ValueError):
        dcn_mesh({"limb": 3}, num_slices=2)
    with pytest.raises(ValueError):
        dcn_mesh(num_slices=3)


def test_batch_on_dcn_has_zero_collectives():
    params = _tiny_narrow()
    sk = nr.gen_secret_key(jax.random.PRNGKey(1), params.bfv)
    rlk = nr.gen_relin_key(jax.random.PRNGKey(2), sk)
    mesh = dcn_mesh({"limb": 4}, num_slices=2)

    a = np.arange(8, dtype=np.uint64) * 977 + 3
    b = np.arange(8, dtype=np.uint64) + 11
    # batch-only sharding on the DCN axis; limb axis unsharded
    ct1 = shard_batch(nr.dbfv_encrypt_sk(jax.random.PRNGKey(3), a, sk,
                                         params), mesh, "batch")
    ct2 = shard_batch(nr.dbfv_encrypt_sk(jax.random.PRNGKey(4), b, sk,
                                         params), mesh, "batch")
    rlk_r = distribute_keys(rlk, mesh)
    fn = jax.jit(lambda x, y, r: nr.dbfv_mul(x, y, r))
    compiled = fn.lower(ct1, ct2, rlk_r).compile()
    txt = compiled.as_text()
    present = [c for c in _COLLECTIVES if c in txt]
    assert not present, f"batch-on-DCN multiply emitted collectives {present}"
    got = nr.dbfv_decrypt(compiled(ct1, ct2, rlk_r), sk)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.uint64), a * b)


@pytest.mark.slow
def test_batch_dcn_limb_ici_mul_matches_local():
    params = _tiny_narrow()
    sk = nr.gen_secret_key(jax.random.PRNGKey(5), params.bfv)
    rlk = nr.gen_relin_key(jax.random.PRNGKey(6), sk)
    mesh = dcn_mesh({"limb": 4}, num_slices=2)

    a = np.array([3, 1 << 20], dtype=np.uint64)
    b = np.array([7, 12345], dtype=np.uint64)
    ct1 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(7), a, sk, params)
    ct2 = nr.dbfv_encrypt_sk(jax.random.PRNGKey(8), b, sk, params)
    ct1s = jax.device_put(ct1, batch_limb_spec(ct1, mesh, "batch", "limb"))
    ct2s = jax.device_put(ct2, batch_limb_spec(ct2, mesh, "batch", "limb"))
    rlk_r = distribute_keys(rlk, mesh)
    prod = jax.jit(lambda x, y, r: nr.dbfv_mul(x, y, r))(ct1s, ct2s, rlk_r)
    got = nr.dbfv_decrypt(prod, sk)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.uint64), a * b)


def test_key_distribution_roundtrip(tmp_path):
    params = _tiny_narrow()
    sk = nr.gen_secret_key(jax.random.PRNGKey(9), params.bfv)
    rlk = nr.gen_relin_key(jax.random.PRNGKey(10), sk)
    mesh = dcn_mesh({"limb": 4}, num_slices=2)

    rlk_r = distribute_keys(rlk, mesh)
    # replicated on every device of the mesh
    assert rlk_r.rlk0.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(rlk_r.rlk0),
                                  np.asarray(rlk.rlk0))

    # offline path: save on the "generating host", load as another host
    path = str(tmp_path / "rlk.npz")
    save_keys_for_hosts(path, rlk, meta={"kind": "relin"})
    from exacto_tpu.utils.serialization import load_meta, load_pytree_like

    assert load_meta(path)["kind"] == "relin"
    rlk2 = load_pytree_like(path, rlk)
    rlk2_r = distribute_keys(rlk2, mesh)
    np.testing.assert_array_equal(np.asarray(rlk2_r.rlk0),
                                  np.asarray(rlk.rlk0))
