"""Hash table build/probe roundtrip tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from cuclark_tpu import u64
from cuclark_tpu.config import DBConfig
from cuclark_tpu.hashdb import KmerDB, build_table
from cuclark_tpu.probe import probe


def _rand_db(n, k=31, seed=0, **kw):
    rng = np.random.default_rng(seed)
    km = np.unique(rng.integers(0, 1 << (2 * k - 2), size=n * 2, dtype=np.uint64))[:n]
    labels = rng.integers(1, 50, size=len(km)).astype(np.uint32)
    names = ["NA"] + [f"T{i}" for i in range(1, 50)]
    cfg = DBConfig(k=k, **kw)
    return build_table(km, labels, names, cfg), km, labels


@pytest.mark.parametrize("num_choices,target_load", [(2, 0.75), (1, 0.3)])
def test_roundtrip_all_present(num_choices, target_load):
    db, km, labels = _rand_db(
        5000, num_choices=num_choices, target_load=target_load, slots=8,
        layout="s2",
    )
    hi, lo = u64.from_np64(km)
    got = probe(jnp.asarray(db.table), db.nb_bits, db.slots, db.num_choices,
                hi, lo, layout=db.layout, seed=db.seed)
    np.testing.assert_array_equal(np.asarray(got), labels.astype(np.int32))


def test_misses_return_zero():
    db, km, labels = _rand_db(2000)
    rng = np.random.default_rng(99)
    queries = rng.integers(0, 1 << 60, size=5000, dtype=np.uint64)
    present = np.isin(queries, km)
    hi, lo = u64.from_np64(queries[~present])
    got = np.asarray(
        probe(jnp.asarray(db.table), db.nb_bits, db.slots, db.num_choices,
                hi, lo, layout=db.layout, seed=db.seed,
                stash_bits=db.stash_bits)
    )
    assert (got == 0).all()


def test_save_load_roundtrip(tmp_path):
    db, km, labels = _rand_db(1000)
    p = tmp_path / "db.npz"
    db.save(p)
    db2 = KmerDB.load(p)
    assert db2.k == db.k and db2.nb_bits == db.nb_bits
    np.testing.assert_array_equal(db2.table, db.table)
    assert db2.target_names == db.target_names
    assert db2.checksum() == db.checksum()


def test_sample_factor_drops_buckets(tmp_path):
    db, km, labels = _rand_db(4000)
    p = tmp_path / "db.npz"
    db.save(p)
    db2 = KmerDB.load(p, sample_factor=2)
    hi, lo = u64.from_np64(km)
    got = np.asarray(
        probe(jnp.asarray(db2.table), db2.nb_bits, db2.slots, db2.num_choices,
              hi, lo, layout=db2.layout, seed=db2.seed,
              stash_bits=db2.stash_bits)
    )
    frac = (got > 0).mean()
    assert 0.3 < frac < 0.7  # roughly half the buckets survive
    # surviving hits still return the right label
    mask = got > 0
    np.testing.assert_array_equal(got[mask], labels[mask].astype(np.int32))


def test_high_load_two_choice():
    # two-choice at 0.9 load must still build and verify
    db, km, labels = _rand_db(20000, target_load=0.9, slots=4, layout="s2")
    hi, lo = u64.from_np64(km)
    got = probe(jnp.asarray(db.table), db.nb_bits, db.slots, db.num_choices,
                hi, lo, layout=db.layout, seed=db.seed)
    np.testing.assert_array_equal(np.asarray(got), labels.astype(np.int32))


def test_probe_np_matches_device():
    db, km, labels = _rand_db(3000)
    got = db.probe_np(km)
    np.testing.assert_array_equal(got, labels.astype(np.int32))
    rng = np.random.default_rng(1)
    misses = rng.integers(0, 1 << 60, size=1000, dtype=np.uint64)
    misses = misses[~np.isin(misses, km)]
    assert (db.probe_np(misses) == 0).all()


def test_verify_catches_corruption():
    db, km, labels = _rand_db(500)
    # wipe every row holding a slot-0 entry (q4: label16 in meta col 4)
    db.table[(db.table[:, 4] & 0xFFFF) > 0] = 0
    with pytest.raises(AssertionError):
        db.verify(km, labels, sample=None)


def test_q_bits_int32_guard():
    """q4/qs row indices are int32 on device: nb_bits > 30 (or a stash
    pushing NB+NBS past 2^31) must be rejected at build/probe time
    instead of silently gathering wrong rows."""
    from cuclark_tpu.hashdb import check_q_bits

    check_q_bits("q4", 30)
    check_q_bits("qs", 30, 22)
    check_q_bits("s2", 31)  # s2 bucket indices are int32 too
    with pytest.raises(ValueError):
        check_q_bits("s2", 32)
    with pytest.raises(ValueError):
        check_q_bits("q4", 31)
    with pytest.raises(ValueError):
        check_q_bits("qs", 30, 30)  # NB + NBS == 2^31 overflows


def test_probe_rejects_overflowing_bits():
    import jax.numpy as jnp

    from cuclark_tpu.probe import probe

    t = jnp.zeros((8, 8), jnp.uint32)
    z = jnp.zeros((4,), jnp.uint32)
    with pytest.raises(ValueError):
        probe(t, 31, 4, 2, z, z, layout="q4")


def test_plan_parts_subtracts_resident_stash():
    """qs split streaming: the resident stash (plus part double-buffer)
    lives on top of the streamed part, so its bytes come off the
    streaming budget (round-3 advisor finding)."""
    from cuclark_tpu.pipeline import Classifier

    clf = Classifier.__new__(Classifier)
    main = np.zeros((6_250_000, 8), np.uint32)   # 200 MB
    stash = np.zeros((1_250_000, 8), np.uint32)  # 40 MB resident
    clf.mesh = None
    clf.table_budget_mb = 100.0
    # without the stash: double-buffered uploads leave 50 MB per part
    # -> 200 MB / 4 parts
    assert clf._plan_parts(main, None, 1) == 4
    # a 40 MB resident stash leaves 60 MB, halved for the double
    # buffer: 30 MB per part -> 8 parts
    assert clf._plan_parts(main, stash, 1) == 8


def test_widen_for_warm_stash():
    """qs sizing: a config whose Poisson stash would exit the warm
    gather regime widens the main table one bit instead (overflow tail
    collapses ~9x); small DBs and the opt-out are unaffected."""
    from cuclark_tpu.config import DBConfig
    from cuclark_tpu.hashdb import (WARM_STASH_MAX_BITS, choose_nb_bits,
                                    choose_stash_bits)

    cfg = DBConfig(k=31, target_load=0.85)
    cfg_off = DBConfig(k=31, target_load=0.85, widen_for_warm_stash=False)
    n = 256_000_000
    assert choose_nb_bits(n, cfg_off) == 27      # minimal table
    bits = choose_nb_bits(n, cfg)                # widened
    assert bits == 28
    assert choose_stash_bits(n, bits) <= WARM_STASH_MAX_BITS
    # small DBs are identical either way
    assert choose_nb_bits(4_000_000, cfg) == choose_nb_bits(4_000_000,
                                                            cfg_off)
