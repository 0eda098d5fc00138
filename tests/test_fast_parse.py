"""Vectorized scanner/packer tests vs the simple record reader."""

import numpy as np
import pytest

from cuclark_tpu import codec
from cuclark_tpu.io import fast_parse, fasta


def _buf(text: str) -> np.ndarray:
    return np.frombuffer(text.encode(), dtype=np.uint8)


def test_scan_fastq_matches_reader(tmp_path):
    text = (
        "@r1 some description\nACGTN\n+\nIIIII\n"
        "@r2/2\tx\nGGGGA\n+xyz\nIIIII\n"
        "@r3\nTTT\n+\nIII\n"
    )
    p = tmp_path / "a.fq"
    p.write_text(text)
    buf = _buf(text)
    ns, ne, ss, se = fast_parse.scan_fastq(buf)
    names = fast_parse.names_of(buf, ns, ne)
    want = list(fasta.read_records(p))
    assert names == [n for n, _ in want]
    got_seqs = [buf.tobytes()[a:b] for a, b in zip(ss, se)]
    assert got_seqs == [s for _, s in want]


def test_scan_fasta_multiline_matches_reader(tmp_path):
    text = ">s1 desc\nACGT\nTTGG\nA\n>s2\nNNNACGT\n>s3 x\nG\n"
    p = tmp_path / "a.fa"
    p.write_text(text)
    buf = _buf(text)
    ns, ne, ss, se = fast_parse.scan_fasta(buf)
    names = fast_parse.names_of(buf, ns, ne)
    want = list(fasta.read_records(p))
    assert names == [n for n, _ in want]
    codes, lengths = fast_parse.pack_block(buf, ss, se, 32)
    for i, (_, seq) in enumerate(want):
        assert lengths[i] == len(seq)
        expect = codec.encode_ascii(seq)
        np.testing.assert_array_equal(codes[i, : len(seq)], expect)
        assert (codes[i, len(seq):] == codec.INVALID).all()


def test_pack_block_fastq_fast_path():
    text = "@a\nACGTACGT\n+\nIIIIIIII\n@b\nNNGG\n+\nIIII\n"
    buf = _buf(text)
    ns, ne, ss, se = fast_parse.scan_fastq(buf)
    codes, lengths = fast_parse.pack_block(buf, ss, se, 16)
    assert lengths.tolist() == [8, 4]
    np.testing.assert_array_equal(
        codes[0, :8], codec.encode_ascii(b"ACGTACGT"))
    np.testing.assert_array_equal(codes[1, :4], codec.encode_ascii(b"NNGG"))


def test_fasta_gt_inside_quality_not_a_record():
    # '>' only counts at line starts
    text = ">s1\nACGT\n>s2\nGGTT\n"
    buf = _buf(text)
    ns, ne, ss, se = fast_parse.scan_fasta(buf)
    assert len(ns) == 2


def test_truncation_to_max_len():
    text = ">long\n" + "ACGT" * 50 + "\n"
    buf = _buf(text)
    ns, ne, ss, se = fast_parse.scan_fasta(buf)
    codes, lengths = fast_parse.pack_block(buf, ss, se, 64)
    assert lengths[0] == 200        # true length reported
    assert codes.shape[1] == 64     # packed truncated


def test_classify_file_matches_records(tmp_path):
    import random

    from cuclark_tpu.config import ClassifyConfig, DBConfig
    from cuclark_tpu.db_build.builder import build_db
    from cuclark_tpu.pipeline import Classifier

    rng = random.Random(11)
    genomes = {}
    file_labels = []
    for t in (1, 2):
        g = "".join(rng.choice("ACGT") for _ in range(2500))
        genomes[t] = g
        p = tmp_path / f"g{t}.fa"
        p.write_text(f">g{t}\n{g}\n")
        file_labels.append((str(p), f"T{t}"))
    db = build_db(file_labels, DBConfig(k=21))

    reads = []
    for i in range(40):
        t = rng.randrange(1, 3)
        pos = rng.randrange(0, 2400 - 100)
        reads.append((f"r{i}", genomes[t][pos: pos + 100]))
    fq = tmp_path / "reads.fq"
    fq.write_text("".join(f"@{n} d\n{s}\n+\n{'I' * len(s)}\n" for n, s in reads))

    clf = Classifier(db, ClassifyConfig(batch_reads=16))
    via_file = list(clf.classify_file(fq))
    via_records = list(
        clf.classify_records((n, s.encode()) for n, s in reads))
    assert via_file == via_records


def test_classify_file_paired_matches_merged(tmp_path):
    import random

    from cuclark_tpu.config import ClassifyConfig, DBConfig
    from cuclark_tpu.db_build.builder import build_db
    from cuclark_tpu.pipeline import Classifier

    rng = random.Random(12)
    g = "".join(rng.choice("ACGT") for _ in range(3000))
    p = tmp_path / "g.fa"
    p.write_text(f">g\n{g}\n")
    db = build_db([(str(p), "T1")], DBConfig(k=21))

    r1, r2 = [], []
    for i in range(10):
        pos = rng.randrange(0, 2500)
        r1.append((f"p{i}", g[pos: pos + 80]))
        r2.append((f"p{i}", g[pos + 120: pos + 200]))
    (tmp_path / "r1.fq").write_text(
        "".join(f"@{n}/1\n{s}\n+\n{'I' * len(s)}\n" for n, s in r1))
    (tmp_path / "r2.fq").write_text(
        "".join(f"@{n}/2\n{s}\n+\n{'I' * len(s)}\n" for n, s in r2))

    clf = Classifier(db, ClassifyConfig(batch_reads=4))
    via_file = list(clf.classify_file(tmp_path / "r1.fq", tmp_path / "r2.fq"))
    merged = [(f"{n}/1", (s1 + "N" + s2).encode())
              for (n, s1), (_, s2) in zip(r1, r2)]
    via_records = list(clf.classify_records(iter(merged), paired=True))
    assert via_file == via_records


def test_fast_csv_path_byte_identical(tmp_path):
    import random

    from cuclark_tpu import native
    from cuclark_tpu.config import ClassifyConfig, DBConfig
    from cuclark_tpu.db_build.builder import build_db
    from cuclark_tpu.io.csv_out import write_results
    from cuclark_tpu.pipeline import Classifier

    if not native.available():
        import pytest

        pytest.skip("no native module")

    rng = random.Random(13)
    g = "".join(rng.choice("ACGT") for _ in range(3000))
    (tmp_path / "g.fa").write_text(f">g\n{g}\n")
    db = build_db([(str(tmp_path / "g.fa"), "Tgt_1")], DBConfig(k=21))
    reads = []
    for i in range(50):
        pos = rng.randrange(0, 2800)
        # include junk reads and a very long name with spaces
        seq = (g[pos: pos + 120] if i % 5 else
               "".join(rng.choice("ACGT") for _ in range(120)))
        reads.append((f"averyveryveryverylongreadname_number_{i:04d}", seq))
    fq = tmp_path / "r.fq"
    fq.write_text("".join(
        f"@{n} comment here\n{s}\n+\n{'I' * len(s)}\n" for n, s in reads))

    clf = Classifier(db, ClassifyConfig(batch_reads=16))
    fast = tmp_path / "fast.csv"
    n = clf.classify_file_to_csv(fq, fast)
    assert n == len(reads)
    slow = tmp_path / "slow.csv"
    write_results(slow, clf.classify_file(fq), db.target_names)
    assert fast.read_bytes() == slow.read_bytes()


def test_extended_fast_csv_matches_dict_path(tmp_path):
    """--extended now rides the native fast path: one bincount per
    batch + C row formatter; must be byte-identical to the per-row
    dict path (ref dense columns, src/CuCLARK_hh.hh:2014-2031)."""
    import random

    from cuclark_tpu.config import ClassifyConfig, DBConfig
    from cuclark_tpu.db_build.builder import build_db
    from cuclark_tpu.io.csv_out import write_results
    from cuclark_tpu.pipeline import Classifier

    rng = random.Random(31)
    genomes = {}
    fl = []
    for t in (1, 2, 3):
        genomes[t] = "".join(rng.choice("ACGT") for _ in range(2000))
        p = tmp_path / f"g{t}.fa"
        p.write_text(f">g{t}\n{genomes[t]}\n")
        fl.append((str(p), f"S{t}"))
    db = build_db(fl, DBConfig(k=21))
    reads = []
    for i in range(23):
        t = rng.randrange(1, 4)
        pos = rng.randrange(0, 1900)
        reads.append((f"r{i}", genomes[t][pos: pos + 95]))
    fq = tmp_path / "r.fq"
    fq.write_text("".join(
        f"@{n}\n{s}\n+\n{'I' * len(s)}\n" for n, s in reads))

    clf = Classifier(db, ClassifyConfig(batch_reads=8, extended=True))
    fast = tmp_path / "fast.csv"
    n = clf.classify_file_to_csv(fq, fast)
    assert n == 23
    want = tmp_path / "want.csv"
    write_results(want, clf.classify_file(fq), db.target_names,
                  extended=True)
    assert fast.read_bytes() == want.read_bytes()
