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


def test_record_batches_honor_cell_cap(db):
    """Long records shrink record-iterator batches to the device cell
    budget instead of exploding the padded arrays (file-path parity)."""
    db = db[0]
    clf = Classifier(db, ClassifyConfig(batch_reads=65536))
    recs = [(f"r{i}", b"ACGT" * 4000) for i in range(64)]  # 16 kb each
    batches = list(clf._record_batches(iter(recs)))
    assert sum(len(b) for b in batches) == 64
    for b in batches:
        mx = max(len(s) for _, s in b)
        assert len(b) * clf._bin_for(mx) <= clf.MAX_BATCH_CELLS
    # short records still reach full batch size
    short = [(f"s{i}", b"ACGT" * 10) for i in range(100)]
    clf2 = Classifier(db, ClassifyConfig(batch_reads=50))
    assert [len(b) for b in clf2._record_batches(iter(short))] == [50, 50]


def test_paired_bin_uses_combined_lengths(db):
    """The paired bin derives from the max per-record COMBINED length
    (the cell-cap shrink loop's metric), not the sum of separate
    maxima."""
    db = db[0]
    clf = Classifier(db, ClassifyConfig())
    buf = np.zeros(10000, np.uint8)
    # record A: mate1 150 + mate2 3800; record B: mate1 3800 + mate2 150
    s1 = np.array([0, 200]); e1 = s1 + np.array([150, 3800])
    s2 = np.array([5000, 9000]); e2 = s2 + np.array([3800, 150])
    L = clf._bin_for_range(buf, s1, e1, buf, s2, e2)
    # combined max is 3951 -> 4096 bin; the old sum-of-maxima metric
    # (3800 + 3800 + 1) would have picked 16384
    assert L == clf._bin_for(3951)


def test_paired_truncation_detected_on_sharded_run(db, tmp_path):
    """A truncated mate-2 file must hard-error on --num-hosts runs too
    (mergePairedFiles parity), not silently drop the tail."""
    db = db[0]
    r1 = tmp_path / "r1.fq"
    r2 = tmp_path / "r2.fq"
    r1.write_text("".join(f"@p{i}\nACGTACGTACGTACGTACGTACGT\n+\n"
                          f"{'I' * 24}\n" for i in range(10)))
    r2.write_text("".join(f"@p{i}\nACGTACGTACGTACGTACGTACGT\n+\n"
                          f"{'I' * 24}\n" for i in range(7)))  # truncated
    clf = Classifier(db, ClassifyConfig(batch_reads=4))
    with pytest.raises(ValueError, match="different record counts"):
        list(clf.classify_file(r1, r2, num_hosts=2, host_id=1))


def test_fastq_align_rejects_at_quality_near_eof():
    """A final quality line starting with '@' (Q31) near a shard
    boundary must not be mistaken for a record header: every record is
    owned by exactly one host even when the boundary lands inside the
    file's last record."""
    import numpy as np

    from cuclark_tpu.io import fast_parse
    from cuclark_tpu.parallel import multihost

    recs = "".join(f"@read{i}\n{'ACGT' * 10}\n+\n{'@' * 40}\n"
                   for i in range(3))
    buf = np.frombuffer(recs.encode(), np.uint8)
    full = fast_parse.names_of(buf, *fast_parse.scan_file(buf)[:2])
    for num_hosts in (2, 3, 4, 5):
        got = []
        for h in range(num_hosts):
            ns, ne, _, _ = multihost.shard_reads_for_host(buf, num_hosts, h)
            got.extend(fast_parse.names_of(buf, ns, ne))
        assert got == full, (num_hosts, got)
