"""CLARK .sz/.ky/.lb interop: export, import, and full round-trip
(reference on-disk layout, src/hashTable_hh.hh:590-663)."""

import random

import numpy as np
import pytest

from cuclark_tpu.cli import main
from cuclark_tpu.config import DBConfig
from cuclark_tpu.db_build.builder import build_db
from cuclark_tpu.hashdb import build_table
from cuclark_tpu.io import clark_db


def test_key_dtype_dispatch():
    # full HTSIZE: log4 = 15 -> u16 up to k=23, u32 to 31, u64 above
    assert clark_db.key_dtype(23, clark_db.HTSIZE_FULL) == np.uint16
    assert clark_db.key_dtype(24, clark_db.HTSIZE_FULL) == np.uint32
    assert clark_db.key_dtype(31, clark_db.HTSIZE_FULL) == np.uint32
    assert clark_db.key_dtype(32, clark_db.HTSIZE_FULL) == np.uint64
    # light HTSIZE: log4 = 12 -> u16 to 20, u32 to 28
    assert clark_db.key_dtype(20, clark_db.HTSIZE_LIGHT) == np.uint16
    assert clark_db.key_dtype(27, clark_db.HTSIZE_LIGHT) == np.uint32


def test_export_import_roundtrip_arrays(tmp_path):
    rng = np.random.default_rng(0)
    km = np.unique(rng.integers(0, 1 << 54, size=5000, dtype=np.uint64))
    labels = rng.integers(1, 40, size=len(km)).astype(np.uint32)
    base = tmp_path / "clarkdb"
    n = clark_db.export_clark_db(km, labels, base, k=27,
                                 htsize=clark_db.HTSIZE_LIGHT)
    assert n == len(km)
    # .sz length is exactly HTSIZE bytes (one per bucket)
    assert (tmp_path / "clarkdb.sz").stat().st_size == clark_db.HTSIZE_LIGHT
    km2, lb2 = clark_db.import_clark_db(base, k=27)
    order = np.argsort(km)
    order2 = np.argsort(km2)
    np.testing.assert_array_equal(km[order], km2[order2])
    np.testing.assert_array_equal(labels[order], lb2[order2])


@pytest.mark.parametrize("layout", ["q4", "s2"])
def test_items_recovers_all_pairs(layout):
    rng = np.random.default_rng(3)
    km = np.unique(rng.integers(0, 1 << 60, size=20000, dtype=np.uint64))
    labels = rng.integers(1, 500, size=len(km)).astype(np.uint32)
    names = ["NA"] + [f"T{i}" for i in range(1, 500)]
    db = build_table(km, labels, names, DBConfig(k=31, layout=layout))
    got_km, got_lb = db.items()
    o1, o2 = np.argsort(km), np.argsort(got_km)
    np.testing.assert_array_equal(km[o1], got_km[o2])
    np.testing.assert_array_equal(labels[o1], got_lb[o2])


def test_cli_roundtrip_identical_classification(tmp_path):
    """build -> export-clark -> import-clark -> classify twice,
    byte-identical CSVs (VERDICT round-trip requirement)."""
    rng = random.Random(9)
    genomes = {}
    lines = []
    for t in (1, 2, 3):
        genomes[t] = "".join(rng.choice("ACGT") for _ in range(2500))
        p = tmp_path / f"g{t}.fa"
        p.write_text(f">g{t}\n{genomes[t]}\n")
        lines.append(f"{p} S{t}")
    (tmp_path / "targets.txt").write_text("\n".join(lines) + "\n")
    reads = []
    for i in range(30):
        t = rng.randrange(1, 4)
        pos = rng.randrange(0, 2300)
        reads.append((f"r{i}", genomes[t][pos: pos + 100]))
    (tmp_path / "r.fq").write_text("".join(
        f"@{n}\n{s}\n+\n{'I' * len(s)}\n" for n, s in reads))

    assert main(["build-db", "-T", str(tmp_path / "targets.txt"),
                 "-D", str(tmp_path / "db"), "-k", "27"]) == 0
    assert main(["classify", "-D", str(tmp_path / "db"),
                 "-O", str(tmp_path / "r.fq"),
                 "-R", str(tmp_path / "a.csv")]) == 0
    assert main(["export-clark", "-D", str(tmp_path / "db"),
                 "-o", str(tmp_path / "ck"), "--light"]) == 0
    assert main(["import-clark", "-i", str(tmp_path / "ck"),
                 "-T", str(tmp_path / "targets.txt"),
                 "-D", str(tmp_path / "db2"), "-k", "27"]) == 0
    assert main(["classify", "-D", str(tmp_path / "db2"),
                 "-O", str(tmp_path / "r.fq"),
                 "-R", str(tmp_path / "b.csv")]) == 0
    assert ((tmp_path / "a.csv").read_bytes()
            == (tmp_path / "b.csv").read_bytes())


def test_bucket_overflow_aborts(tmp_path):
    # >255 elements in one bucket must refuse to export, like the
    # reference's write-time abort (hashTable_hh.hh:616-624)
    km = (np.arange(300, dtype=np.uint64) * np.uint64(97)  # same bucket
          + np.uint64(5))
    labels = np.ones(300, np.uint32)
    with pytest.raises(ValueError, match="exceeds 255"):
        clark_db.export_clark_db(km, labels, tmp_path / "x", k=27, htsize=97)
