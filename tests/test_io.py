"""I/O tests: FASTA/FASTQ parsing, paired merge, gzip, CSV format."""

import gzip

from cuclark_tpu.io import fasta
from cuclark_tpu.io.csv_out import format_row, write_results


def test_fasta_multiline(tmp_path):
    p = tmp_path / "a.fa"
    p.write_text(">seq1 desc here\nACGT\nACGT\n>seq2\tx\nTTTT\n")
    recs = list(fasta.read_records(p))
    assert recs == [("seq1", b"ACGTACGT"), ("seq2", b"TTTT")]


def test_fastq(tmp_path):
    p = tmp_path / "a.fq"
    p.write_text("@r1 extra\nACGTN\n+\nIIIII\n@r2\nGGGG\n+\nIIII\n")
    recs = list(fasta.read_records(p))
    assert recs == [("r1", b"ACGTN"), ("r2", b"GGGG")]


def test_gzip_transparent(tmp_path):
    p = tmp_path / "a.fa.gz"
    with gzip.open(p, "wt") as f:
        f.write(">s\nACGT\n")
    assert list(fasta.read_records(p)) == [("s", b"ACGT")]
    assert fasta.sniff_format(p) == "fasta"


def test_paired_merge(tmp_path):
    p1 = tmp_path / "r1.fq"
    p2 = tmp_path / "r2.fq"
    p1.write_text("@a/1\nACGT\n+\nIIII\n")
    p2.write_text("@a/2\nTTTT\n+\nIIII\n")
    recs = list(fasta.read_paired_records(p1, p2))
    assert recs == [("a/1", b"ACGTNTTTT")]


def test_file_list_mode(tmp_path):
    fa = tmp_path / "x.fa"
    fa.write_text(">s\nACGT\n")
    lst = tmp_path / "jobs.txt"
    lst.write_text(f"{fa} out1.csv\n{fa} out2.csv\n")
    pairs = fasta.parse_file_list(lst)
    assert pairs == [(str(fa), "out1.csv"), (str(fa), "out2.csv")]
    assert fasta.parse_file_list(fa) is None


def test_csv_format_g(tmp_path):
    row = {
        "name": "read_x" * 20,  # long name -> truncated to 39 chars
        "length": 100,
        "gamma": 0.5142857142857142,
        "index_best": 1,
        "best": 36,
        "index_second": 2,
        "second": 1,
        "confidence": 0.972972972972973,
    }
    names = ["NA", "TAXA", "TAXB"]
    line = format_row(row, names)
    name, length, gamma, t1, s1, t2, s2, conf = line.rstrip().split(",")
    assert len(name) == 39
    assert length == "100"
    assert gamma == "%g" % 0.5142857142857142 == "0.514286"
    assert (t1, s1, t2, s2) == ("TAXA", "36", "TAXB", "1")
    assert conf == "0.972973"


def test_write_results_header(tmp_path):
    out = tmp_path / "r.csv"
    names = ["NA", "A", "B"]
    rows = [{
        "name": "r1", "length": 10, "gamma": 0.0, "index_best": 0,
        "best": 0, "index_second": 0, "second": 0, "confidence": 0.0,
    }]
    write_results(out, rows, names)
    lines = out.read_text().splitlines()
    assert lines[0] == ("Object_ID,Length,Gamma,1st_assignment,score1,"
                        "2nd_assignment,score2,confidence")
    assert lines[1] == "r1,10,0,NA,0,NA,0,0"

    write_results(out, rows, names, extended=True)
    lines = out.read_text().splitlines()
    assert lines[0] == ("Object_ID,A,B,Length,Gamma,1st_assignment,score1,"
                        "2nd_assignment,score2,confidence")


def test_empty_objects_list_raises(tmp_path):
    """An empty/whitespace-only -O file must error, not silently
    classify nothing with exit 0."""
    import pytest

    from cuclark_tpu.io import fasta

    p = tmp_path / "empty.txt"
    p.write_text("  \n\n")
    with pytest.raises(ValueError, match="Failed to recognize"):
        fasta.parse_file_list(p)


def test_paired_list_without_results_raises(tmp_path):
    import pytest

    from cuclark_tpu.io import fasta

    r = tmp_path / "a.fq"
    r.write_text("@x\nACGT\n+\nIIII\n")
    l1 = tmp_path / "l1.txt"
    l2 = tmp_path / "l2.txt"
    l1.write_text(f"{r}\n")
    l2.write_text(f"{r}\n")
    with pytest.raises(ValueError, match="needs -R"):
        fasta.parse_paired_file_lists(l1, l2, None)


def test_truncated_fastq_record_raises(tmp_path):
    import pytest

    from cuclark_tpu.io import fasta

    p = tmp_path / "t.fq"
    p.write_text("@a\nACGT\n+\nIIII\n@b\nGGGG\n")  # no +/qual lines
    with pytest.raises(ValueError, match="truncated or malformed"):
        list(fasta.read_records(p))


def test_set_targets_rank_without_taxonomy_errors(tmp_path):
    """An explicit rank without --taxonomy-dir must error, not silently
    fall back to per-file custom labels."""
    import argparse

    from cuclark_tpu.taxonomy.targets import set_targets

    (tmp_path / "refs").mkdir()
    (tmp_path / "refs" / "g.fa").write_text(">g\nACGT\n")
    rc = set_targets(argparse.Namespace(
        db_dir=str(tmp_path / "db"), ref_dirs=[str(tmp_path / "refs")],
        rank="genus", taxonomy_dir=None))
    assert rc == 1
    assert not (tmp_path / "db" / "targets.txt").exists()
