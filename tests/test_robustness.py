"""Input robustness: lowercase, CRLF, empty inputs, odd names, IUPAC."""

import random

import numpy as np
import pytest

from cuclark_tpu.config import ClassifyConfig, DBConfig
from cuclark_tpu.db_build.builder import build_db
from cuclark_tpu.pipeline import Classifier
from tests import oracle


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("robust")
    rng = random.Random(55)
    file_labels = []
    seqs = {}
    for t in (1, 2):
        g = "".join(rng.choice("ACGT") for _ in range(2500))
        seqs[t] = g
        p = tmp / f"g{t}.fa"
        p.write_text(f">g{t}\n{g}\n")
        file_labels.append((str(p), f"R{t}"))
    db = build_db(file_labels, DBConfig(k=21))
    odb = oracle.build_db({t: [s] for t, s in seqs.items()}, 21)
    return db, odb, seqs


def _classify_one(db, seq: bytes):
    clf = Classifier(db, ClassifyConfig(batch_reads=4))
    return next(clf.classify_records([("x", seq)]))


def test_lowercase_equivalent(db):
    d, odb, seqs = db
    s = seqs[1][100:220]
    up = _classify_one(d, s.encode())
    low = _classify_one(d, s.lower().encode())
    assert up == low
    assert up["best"] > 0


def test_iupac_codes_break_parts(db):
    d, odb, seqs = db
    s = seqs[2][0:60] + "RYKMSW" + seqs[2][300:360]
    row = _classify_one(d, s.encode())
    want = oracle.classify_read(s, odb, 21, d.num_targets)
    assert (row["total"], row["index_best"], row["best"]) == want[:3]


def test_crlf_fasta(db, tmp_path):
    d, odb, seqs = db
    s = seqs[1][500:650]
    p = tmp_path / "crlf.fa"
    p.write_bytes(b">win name\r\n" + s[:75].encode() + b"\r\n"
                  + s[75:].encode() + b"\r\n")
    clf = Classifier(d, ClassifyConfig(batch_reads=4))
    row = next(clf.classify_file(p))
    assert row["name"] == "win"
    assert row["length"] == len(s)
    want = oracle.classify_read(s, odb, 21, d.num_targets)
    assert (row["total"], row["index_best"], row["best"]) == want[:3]


def test_empty_file(db, tmp_path):
    d, _, _ = db
    p = tmp_path / "empty.fa"
    p.write_text("")
    clf = Classifier(d, ClassifyConfig(batch_reads=4))
    assert list(clf.classify_file(p)) == []


def test_batch_larger_than_file(db, tmp_path):
    d, odb, seqs = db
    p = tmp_path / "two.fq"
    s1, s2 = seqs[1][0:100], seqs[2][0:100]
    p.write_text(f"@a\n{s1}\n+\n{'I'*100}\n@b\n{s2}\n+\n{'I'*100}\n")
    clf = Classifier(d, ClassifyConfig(batch_reads=5000))
    rows = list(clf.classify_file(p))
    assert [r["name"] for r in rows] == ["a", "b"]
    assert rows[0]["index_best"] == 1 and rows[1]["index_best"] == 2


def test_read_of_all_ns(db):
    d, _, _ = db
    row = _classify_one(d, b"N" * 80)
    assert row["total"] == 0 and row["index_best"] == 0


def test_long_reads_shrink_batches(db, tmp_path):
    d, odb, seqs = db
    # one 40kb read among short ones must not break classification
    long_read = (seqs[1] * 16)[:40000]
    p = tmp_path / "mix.fa"
    recs = [f">long\n{long_read}\n"]
    for i in range(5):
        recs.append(f">s{i}\n{seqs[2][i*100:(i*100)+120]}\n")
    p.write_text("".join(recs))
    clf = Classifier(d, ClassifyConfig(batch_reads=512))
    rows = list(clf.classify_file(p))
    assert [r["name"] for r in rows] == ["long", "s0", "s1", "s2", "s3", "s4"]
    want = oracle.classify_read(long_read, odb, 21, d.num_targets)
    got = rows[0]
    assert (got["total"], got["index_best"], got["best"]) == want[:3]
    assert all(r["index_best"] == 2 for r in rows[1:])
