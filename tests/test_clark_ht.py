""".ht target-specific-set interop (reference --tsk artifacts,
EHashtable::SaveMultiple/Load, src/HashTableStorage_hh.hh:295-405,
697-737)."""

import numpy as np
import pytest

from cuclark_tpu import codec
from cuclark_tpu.cli import main
from cuclark_tpu.config import DBConfig
from cuclark_tpu.hashdb import build_table
from cuclark_tpu.io import clark_ht

from tests.oracle import kmer_value


def test_kmer_strings_match_oracle():
    """IndexTovector spelling: value -> base string must invert the
    oracle's string -> value encoding."""
    rng = np.random.default_rng(0)
    k = 9
    for _ in range(20):
        s = "".join(rng.choice(list("ACGT"), size=k))
        v = kmer_value(s)
        got = clark_ht.kmer_strings(np.array([v], np.uint64), k)[0]
        assert got == s.encode()


def test_export_format(tmp_path):
    km = np.array([kmer_value("ACGTACG"), kmer_value("TTTAAAC")], np.uint64)
    lb = np.array([1, 2], np.uint32)
    names = ["NA", "Ecoli", "Bsub"]
    n = clark_ht.export_ht_dir(km, lb, names, tmp_path, 7)
    assert n == 2
    txt = (tmp_path / "Ecoli_k7.ht").read_text().splitlines()
    assert txt[0] == ("#Target specific k-mers labeled Ecoli and "
                      "appearing strictly more than 0 times.")
    assert txt[1] == "#IKMER ICOUNT 7-MER "
    assert txt[2] == "#"
    fields = txt[3].split("\t")
    assert fields == [str(int(km[0])), "1", "ACGTACG"]


def test_round_trip(tmp_path):
    rng = np.random.default_rng(5)
    km = np.unique(codec.canonical_np(
        rng.integers(0, 1 << 53, size=5000, dtype=np.uint64), 27))
    lb = (rng.integers(1, 4, size=len(km))).astype(np.uint32)
    names = ["NA", "A", "B", "C"]
    clark_ht.export_ht_dir(km, lb, names, tmp_path, 27)
    km2, lb2, names2, k2 = clark_ht.import_ht_dir(tmp_path)
    assert k2 == 27
    assert names2 == names  # filename order == label order here
    order = np.argsort(km2)
    want = np.argsort(km)
    assert np.array_equal(km2[order], km[want])
    assert np.array_equal(lb2[order], lb[want])


def test_cli_export_import_ht(tmp_path):
    rng = np.random.default_rng(9)
    km = np.unique(codec.canonical_np(
        rng.integers(0, 1 << 53, size=3000, dtype=np.uint64), 27))
    lb = (rng.integers(1, 3, size=len(km))).astype(np.uint32)
    db = build_table(km, lb, ["NA", "T1", "T2"], DBConfig(k=27))
    d1 = tmp_path / "db1"
    d1.mkdir()
    db.save(d1 / "db_k27.npz")

    ht = tmp_path / "ht"
    assert main(["export-ht", "-D", str(d1), "-o", str(ht)]) == 0
    assert sorted(p.name for p in ht.glob("*.ht")) == [
        "T1_k27.ht", "T2_k27.ht"]
    d2 = tmp_path / "db2"
    assert main(["import-ht", "-i", str(ht), "-D", str(d2)]) == 0

    from cuclark_tpu.hashdb import KmerDB

    db2 = KmerDB.load(next(d2.glob("db_k*.npz")))
    assert db2.k == 27
    k1, l1 = db.items()
    k2, l2 = db2.items()
    o1, o2 = np.argsort(k1), np.argsort(k2)
    assert np.array_equal(k1[o1], k2[o2])
    assert np.array_equal(l1[o1], l2[o2])
