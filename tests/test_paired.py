"""Paired-end completeness: mate-id validation + paired list mode
(reference mergePairedFiles src/file.cc:205-268 and the paired run()
overload src/CuCLARK_hh.hh:482-506)."""

import random

import pytest

from cuclark_tpu.cli import main
from cuclark_tpu.io import fasta


def test_mate_id_separators():
    assert fasta.mate_id("read1/1") == "read1"
    assert fasta.mate_id("read1/2") == "read1"
    assert fasta.mate_id("read1 extra") == "read1"
    assert fasta.mate_id("read1\tx") == "read1"
    assert fasta.mate_id("read1") == "read1"


def test_read_paired_records_id_mismatch(tmp_path):
    p1 = tmp_path / "r1.fq"
    p2 = tmp_path / "r2.fq"
    p1.write_text("@a/1\nACGT\n+\nIIII\n@b/1\nACGT\n+\nIIII\n")
    p2.write_text("@a/2\nTTTT\n+\nIIII\n@c/2\nTTTT\n+\nIIII\n")
    with pytest.raises(ValueError, match="read id does not match"):
        list(fasta.read_paired_records(p1, p2))


def test_read_paired_records_count_mismatch(tmp_path):
    p1 = tmp_path / "r1.fq"
    p2 = tmp_path / "r2.fq"
    p1.write_text("@a/1\nACGT\n+\nIIII\n@b/1\nACGT\n+\nIIII\n")
    p2.write_text("@a/2\nTTTT\n+\nIIII\n")
    with pytest.raises(ValueError, match="different record counts"):
        list(fasta.read_paired_records(p1, p2))


@pytest.fixture(scope="module")
def paired_demo(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("paired")
    rng = random.Random(7)
    g = "".join(rng.choice("ACGT") for _ in range(3000))
    (tmp / "g.fa").write_text(f">g\n{g}\n")
    (tmp / "targets.txt").write_text(f"{tmp / 'g.fa'} T1\n")
    r1, r2 = [], []
    for i in range(12):
        pos = rng.randrange(0, 2500)
        r1.append((f"p{i}", g[pos: pos + 80]))
        r2.append((f"p{i}", g[pos + 120: pos + 200]))
    for mate, rr in ((1, r1), (2, r2)):
        (tmp / f"r{mate}.fq").write_text("".join(
            f"@{n}/{mate}\n{s}\n+\n{'I' * len(s)}\n" for n, s in rr))
    main(["build-db", "-T", str(tmp / "targets.txt"),
          "-D", str(tmp / "db"), "-k", "21"])
    return tmp


def test_cli_paired_fast_path_id_mismatch(paired_demo, tmp_path):
    tmp = paired_demo
    bad = tmp_path / "bad2.fq"
    lines = (tmp / "r2.fq").read_text().splitlines()
    lines[4] = "@WRONG/2"
    bad.write_text("\n".join(lines) + "\n")
    rc = main(["classify", "-D", str(tmp / "db"),
               "-P", str(tmp / "r1.fq"), str(bad),
               "-R", str(tmp_path / "out.csv")])
    assert rc == 1  # ValueError -> CLI error path


def test_cli_paired_fast_path_count_mismatch(paired_demo, tmp_path):
    tmp = paired_demo
    short = tmp_path / "short2.fq"
    lines = (tmp / "r2.fq").read_text().splitlines()
    short.write_text("\n".join(lines[:-4]) + "\n")
    rc = main(["classify", "-D", str(tmp / "db"),
               "-P", str(tmp / "r1.fq"), str(short),
               "-R", str(tmp_path / "out.csv")])
    assert rc == 1


def test_cli_paired_list_mode(paired_demo, tmp_path):
    tmp = paired_demo
    l1 = tmp_path / "list1.txt"
    l2 = tmp_path / "list2.txt"
    lr = tmp_path / "listR.txt"
    outs = [tmp_path / f"out{i}.csv" for i in (0, 1)]
    l1.write_text(f"{tmp / 'r1.fq'}\n{tmp / 'r1.fq'}\n")
    l2.write_text(f"{tmp / 'r2.fq'}\n{tmp / 'r2.fq'}\n")
    lr.write_text("\n".join(str(o) for o in outs) + "\n")
    rc = main(["classify", "-D", str(tmp / "db"),
               "-P", str(l1), str(l2), "-R", str(lr)])
    assert rc == 0
    for o in outs:
        rows = o.read_text().splitlines()
        assert len(rows) == 13  # header + 12 pairs
        # paired normalization: length excludes the joining N
        assert rows[1].split(",")[1] == "160"
        assert all(r.split(",")[3] == "T1" for r in rows[1:])


def test_cli_paired_direct_still_works(paired_demo, tmp_path):
    tmp = paired_demo
    out = tmp_path / "direct.csv"
    rc = main(["classify", "-D", str(tmp / "db"),
               "-P", str(tmp / "r1.fq"), str(tmp / "r2.fq"),
               "-R", str(out)])
    assert rc == 0
    assert len(out.read_text().splitlines()) == 13
