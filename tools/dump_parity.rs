//! Parity-vector dump generator for the Rust reference (RajeshRk18/exacto).
//!
//! Drop this file into the reference crate as `examples/dump_parity.rs`
//! and run:
//!
//!     cargo run --release --example dump_parity -- /tmp/exacto_dump
//!
//! then diff against exacto_tpu's frozen fixtures:
//!
//!     python tools/diff_parity_vectors.py --rust-dump /tmp/exacto_dump
//!
//! This closes SURVEY item 41 (bit-exact parity vs the reference RNG)
//! wherever a Rust toolchain exists; the tpu repo's environment has none,
//! so the file ships here ready to copy.  Draw order and seed MUST match
//! tools/freeze_parity_vectors.py exactly: per preset a FRESH
//! `ChaCha20Rng::seed_from_u64(42)` stream, drawing sk -> pk ->
//! ct_sk(123) -> ct_pk(77) -> (dbfv presets) dbfv_ct(value), value =
//! 200 for compact_dbfv and 0x0123456789ABCDEF for u64_dbfv.
//! (reference RNG seams: src/bfv/keygen.rs:58-66, src/bfv/encrypt.rs:29,
//! src/dbfv/encrypt.rs:27)
//!
//! Output layout (accepted by diff_parity_vectors.load_dump_array):
//!   <dir>/<preset>__<key>.bin   little-endian u64, C-contiguous
//! keys/shapes per tests/fixtures/parity_vectors.json:
//!   sk_coeffs [n]; pk0, pk1, ct_sk_c0, ct_sk_c1, ct_pk_c0, ct_pk_c1
//!   [L, n]; dbfv_c0, dbfv_c1 [d, L, n] (limb-major).  All residues are
//!   coefficient-domain standard form (inverse NTT of each RNS component).

use std::fs;
use std::io::Write;
use std::path::Path;
use std::sync::Arc;

use rand::SeedableRng;
use rand_chacha::ChaCha20Rng;

use exacto::bfv::encoding::encode_scalar;
use exacto::bfv::encrypt::{encrypt_pk_with_rng, encrypt_sk_with_rng};
use exacto::bfv::keygen::{gen_public_key_with_rng, gen_secret_key_with_rng};
use exacto::dbfv::encrypt::dbfv_encrypt_with_rng;
use exacto::params::presets::{compact_bfv, compact_dbfv, small_bfv, u64_dbfv};
use exacto::params::{BfvParams, DbfvParams};
use exacto::ring::RnsPoly;

const SEED: u64 = 42;
const MSG_SK: u64 = 123;
const MSG_PK: u64 = 77;

fn write_u64s(dir: &Path, name: &str, vals: &[u64]) {
    let mut bytes = Vec::with_capacity(vals.len() * 8);
    for v in vals {
        bytes.extend_from_slice(&v.to_le_bytes());
    }
    let path = dir.join(format!("{name}.bin"));
    let mut f = fs::File::create(&path)
        .unwrap_or_else(|e| panic!("create {path:?}: {e}"));
    f.write_all(&bytes).unwrap();
    println!("wrote {path:?} ({} u64 words)", vals.len());
}

/// Coefficient-domain residues [L, n] of an RnsPoly, row-major: one
/// inverse NTT per component (matches exacto_tpu's ring.rns.to_u64_host).
fn rns_residues(p: &RnsPoly) -> Vec<u64> {
    let mut out = Vec::new();
    for comp in &p.components {
        out.extend_from_slice(&comp.to_coeff_poly().coeffs);
    }
    out
}

fn dump_bfv(dir: &Path, preset: &str, params: &Arc<BfvParams>,
            dparams: Option<(&Arc<DbfvParams>, u64)>) {
    let mut rng = ChaCha20Rng::seed_from_u64(SEED);

    let sk = gen_secret_key_with_rng(params, &mut rng).expect("keygen sk");
    // sk ternary coeffs at q0 == coefficient form of RNS component 0
    write_u64s(dir, &format!("{preset}__sk_coeffs"),
               &sk.poly.components[0].to_coeff_poly().coeffs);

    let pk = gen_public_key_with_rng(&sk, &mut rng).expect("keygen pk");
    write_u64s(dir, &format!("{preset}__pk0"), &rns_residues(&pk.pk0));
    write_u64s(dir, &format!("{preset}__pk1"), &rns_residues(&pk.pk1));

    let pt_sk = encode_scalar(MSG_SK % params.plain_modulus, params)
        .expect("encode 123");
    let ct_sk = encrypt_sk_with_rng(&pt_sk, &sk, params, &mut rng)
        .expect("encrypt_sk");
    write_u64s(dir, &format!("{preset}__ct_sk_c0"), &rns_residues(&ct_sk.c[0]));
    write_u64s(dir, &format!("{preset}__ct_sk_c1"), &rns_residues(&ct_sk.c[1]));

    let pt_pk = encode_scalar(MSG_PK % params.plain_modulus, params)
        .expect("encode 77");
    let ct_pk = encrypt_pk_with_rng(&pt_pk, &pk, params, &mut rng)
        .expect("encrypt_pk");
    write_u64s(dir, &format!("{preset}__ct_pk_c0"), &rns_residues(&ct_pk.c[0]));
    write_u64s(dir, &format!("{preset}__ct_pk_c1"), &rns_residues(&ct_pk.c[1]));

    if let Some((dp, value)) = dparams {
        let dct = dbfv_encrypt_with_rng(value, &pk, dp, &mut rng)
            .expect("dbfv_encrypt");
        // [d, L, n]: limb-major concatenation of each limb's residues
        let mut c0 = Vec::new();
        let mut c1 = Vec::new();
        for limb in &dct.limbs {
            c0.extend_from_slice(&rns_residues(&limb.c[0]));
            c1.extend_from_slice(&rns_residues(&limb.c[1]));
        }
        write_u64s(dir, &format!("{preset}__dbfv_c0"), &c0);
        write_u64s(dir, &format!("{preset}__dbfv_c1"), &c1);
    }
}

fn main() {
    let dir_arg = std::env::args().nth(1)
        .unwrap_or_else(|| "/tmp/exacto_dump".to_string());
    let dir = Path::new(&dir_arg);
    fs::create_dir_all(dir).expect("mkdir dump dir");

    dump_bfv(dir, "compact_bfv", &compact_bfv().unwrap(), None);
    dump_bfv(dir, "small_bfv", &small_bfv().unwrap(), None);

    let cd = compact_dbfv().unwrap();
    dump_bfv(dir, "compact_dbfv", &cd.bfv_params, Some((&cd, 200)));

    let ud = u64_dbfv().unwrap();
    dump_bfv(dir, "u64_dbfv", &ud.bfv_params,
             Some((&ud, 0x0123_4567_89AB_CDEF)));

    println!("done -> {dir:?}");
}
