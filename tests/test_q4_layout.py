"""q4 quotient-compressed table layout: exactness, build robustness,
and cross-layout equivalence with the legacy s2 layout."""

import numpy as np
import pytest

import jax.numpy as jnp

from cuclark_tpu import u64
from cuclark_tpu.config import DBConfig
from cuclark_tpu.hashdb import (
    KmerDB,
    build_table,
    feistel_mix,
    probe_np_q4,
)
from cuclark_tpu.probe import probe


def _db(n, layout, k=31, seed=0, **kw):
    rng = np.random.default_rng(seed)
    km = np.unique(rng.integers(0, 1 << (2 * k - 2), size=n * 2,
                                dtype=np.uint64))[:n]
    labels = rng.integers(1, 300, size=len(km)).astype(np.uint32)
    names = ["NA"] + [f"T{i}" for i in range(1, 300)]
    return build_table(km, labels, names,
                       DBConfig(k=k, layout=layout, **kw)), km, labels


def test_feistel_is_bijective_sample():
    rng = np.random.default_rng(0)
    hi = rng.integers(0, 1 << 32, size=100000, dtype=np.uint64).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, size=100000, dtype=np.uint64).astype(np.uint32)
    h1, l2 = feistel_mix(hi, lo, seed=3)
    packed = (h1.astype(np.uint64) << np.uint64(32)) | l2.astype(np.uint64)
    orig = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    # distinct inputs stay distinct (bijection)
    assert len(np.unique(packed)) == len(np.unique(orig))


def test_q4_roundtrip_and_misses():
    db, km, labels = _db(30000, "q4")
    assert db.layout == "q4" and db.table.shape[1] == 8
    hi, lo = u64.from_np64(km)
    got = np.asarray(probe(jnp.asarray(db.table), db.nb_bits, db.slots,
                           db.num_choices, hi, lo,
                           layout="q4", seed=db.seed))
    np.testing.assert_array_equal(got, labels.astype(np.int32))
    rng = np.random.default_rng(9)
    q = rng.integers(0, 1 << 60, size=20000, dtype=np.uint64)
    q = q[~np.isin(q, km)]
    hi, lo = u64.from_np64(q)
    got = np.asarray(probe(jnp.asarray(db.table), db.nb_bits, db.slots,
                           db.num_choices, hi, lo,
                           layout="q4", seed=db.seed))
    assert (got == 0).all()


def test_q4_high_load():
    db, km, labels = _db(120000, "q4", target_load=0.9)
    got = db.probe_np(km)
    np.testing.assert_array_equal(got, labels.astype(np.int32))
    # C=4 two-choice at 0.9 load: table must not have grown past need
    assert db.nb * 4 * 0.9 >= db.num_kmers


def test_q4_numpy_matches_device():
    db, km, _ = _db(5000, "q4", seed=4)
    hi, lo = u64.from_np64(km)
    rng = np.random.default_rng(5)
    q = rng.integers(0, 1 << 60, size=5000, dtype=np.uint64)
    qhi, qlo = u64.from_np64(q)
    for HI, LO in ((hi, lo), (qhi, qlo)):
        HI, LO = np.asarray(HI), np.asarray(LO)
        np_lab = probe_np_q4(db.table, db.nb_bits, db.seed, HI, LO)
        dev = np.asarray(probe(jnp.asarray(db.table), db.nb_bits, db.slots,
                               db.num_choices, jnp.asarray(HI),
                               jnp.asarray(LO), layout="q4", seed=db.seed))
        np.testing.assert_array_equal(np_lab, dev)


def test_q4_save_load(tmp_path):
    db, km, labels = _db(2000, "q4")
    db.save(tmp_path / "db.npz")
    db2 = KmerDB.load(tmp_path / "db.npz")
    assert db2.layout == "q4" and db2.seed == db.seed
    np.testing.assert_array_equal(db2.probe_np(km), labels.astype(np.int32))


def test_layouts_classify_identically(tmp_path):
    """Same reads, same DB content, both layouts -> byte-identical CSV."""
    import random

    from cuclark_tpu.config import ClassifyConfig
    from cuclark_tpu.pipeline import Classifier

    rng = random.Random(21)
    g = {t: "".join(rng.choice("ACGT") for _ in range(3000)) for t in (1, 2)}
    files = []
    for t in (1, 2):
        p = tmp_path / f"g{t}.fa"
        p.write_text(f">g{t}\n{g[t]}\n")
        files.append((str(p), f"S{t}"))
    reads = []
    for i in range(40):
        t = rng.randrange(1, 3)
        pos = rng.randrange(0, 2800)
        reads.append((f"r{i}", g[t][pos: pos + 120]))
    fq = tmp_path / "r.fq"
    fq.write_text("".join(f"@{n}\n{s}\n+\n{'I' * len(s)}\n" for n, s in reads))

    from cuclark_tpu.db_build.builder import build_db

    rows = {}
    for layout in ("q4", "s2"):
        db = build_db(files, DBConfig(k=25, layout=layout))
        clf = Classifier(db, ClassifyConfig(batch_reads=16))
        rows[layout] = list(clf.classify_file(fq))
    assert rows["q4"] == rows["s2"]


def test_q4_sample_factor(tmp_path):
    db, km, labels = _db(60000, "q4")
    db.save(tmp_path / "db.npz")
    db2 = KmerDB.load(tmp_path / "db.npz", sample_factor=2)
    got = db2.probe_np(km)
    frac = (got > 0).mean()
    assert 0.3 < frac < 0.7
    mask = got > 0
    np.testing.assert_array_equal(got[mask], labels[mask].astype(np.int32))


def test_sample_factor_fraction_quarter(tmp_path):
    """-s semantics: every s-th bucket by index retains ~1/s of the
    k-mers (documented divergence from the reference's every-s-th
    NON-EMPTY bucket, src/CuClarkDB.cu:508-524 — same retained
    fraction, different subset)."""
    db, km, labels = _db(80000, "q4")
    db.save(tmp_path / "db.npz")
    for s in (2, 4, 8):
        dbs = KmerDB.load(tmp_path / "db.npz", sample_factor=s)
        frac = (dbs.probe_np(km) > 0).mean()
        assert abs(frac - 1.0 / s) < 0.02, (s, frac)
