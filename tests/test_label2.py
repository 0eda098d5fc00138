"""label2 / chromosome-centromere semantics (targets.txt third column;
reference getTargetsData src/CuCLARK_hh.hh:1822-1850 + RemoveCommon
multiplicity==2 path src/HashTableStorage_hh.hh:242-292)."""

import numpy as np
import pytest

from cuclark_tpu.config import DBConfig
from cuclark_tpu.db_build.builder import (
    LabelSpace,
    build_db,
    discriminate,
    parse_targets_file,
)


def test_parse_targets_third_column(tmp_path):
    fa = tmp_path / "g.fa"
    fa.write_text(">s\nACGTACGTACGT\n")
    t = tmp_path / "targets.txt"
    t.write_text(f"{fa} chr1A chr1C\n{fa} chr1B\n")
    entries = parse_targets_file(t)
    assert entries[0][1] == "chr1A" and entries[0][2] == "chr1C"
    assert entries[1][1] == "chr1B" and entries[1][2] is None


def test_label_space_layout():
    space = LabelSpace([("f1", "chr1A", "chr1C"), ("f2", "chr1B", "chr1C"),
                        ("f3", "other", None)])
    # NA + label1s first-seen + label2s after all label1s
    assert space.names == ["NA", "chr1A", "chr1B", "other", "chr1C"]
    # chr1A/chr1B/chr1C are siblings (same length, same prefix)
    assert space.cls[1] == space.cls[2] == space.cls[4]
    assert space.cls[3] != space.cls[1]
    # relabel maps chromosome labels to the centromere id
    assert space.relabel[1] == 4 and space.relabel[2] == 4
    assert space.relabel[3] == 3


def test_single_char_labels_not_siblings():
    space = LabelSpace([("f1", "A", None), ("f2", "B", None)])
    assert space.cls[1] != space.cls[2]


def test_mult2_centromere_relabel():
    """A k-mer in chr1A once and chr1B once (multiplicity 2) survives
    under the centromere label; three sibling occurrences (mult 3) and
    non-sibling sharing (mult >= 3) are dropped."""
    space = LabelSpace([("f1", "chr1A", "chr1C"), ("f2", "chr1B", None),
                        ("f3", "other", None)])
    A, B, O = space.ids["chr1A"], space.ids["chr1B"], space.ids["other"]
    C = space.c_ids["chr1C"]
    kmers = np.array([10, 10,          # A then B once -> mult 2 -> chr1C
                      20, 20, 20,      # A then B twice -> mult 3 -> drop
                      30, 30,          # A then other -> mult 3 -> drop
                      40],             # A only -> specific
                     dtype=np.uint64)
    labels = np.array([A, B, A, B, B, A, O, A], dtype=np.uint32)
    uk, ul, uc = discriminate(kmers, labels, label_space=space)
    np.testing.assert_array_equal(uk, [10, 40])
    np.testing.assert_array_equal(ul, [C, A])
    np.testing.assert_array_equal(uc, [2, 1])


def test_mult2_no_matching_centromere_keeps_first_label():
    """RemoveCommon marks multiplicity-2 k-mers even when no label2
    prefix-matches; they stay under the first-seen label
    (src/HashTableStorage_hh.hh:264 marks before the search)."""
    # declare an unrelated centromere so the path is active
    space = LabelSpace([("f1", "chr1A", "zzzC"), ("f2", "chr1B", None)])
    A, B = space.ids["chr1A"], space.ids["chr1B"]
    kmers = np.array([10, 10], dtype=np.uint64)
    labels = np.array([B, A], dtype=np.uint32)  # first-seen is B
    uk, ul, _ = discriminate(kmers, labels, label_space=space)
    np.testing.assert_array_equal(uk, [10])
    np.testing.assert_array_equal(ul, [B])


def test_no_centromeres_mult2_dropped():
    """Without label2 declarations, shared k-mers are dropped as before."""
    space = LabelSpace([("f1", "chr1A", None), ("f2", "chr1B", None)])
    A, B = space.ids["chr1A"], space.ids["chr1B"]
    uk, _, _ = discriminate(np.array([10, 10], np.uint64),
                            np.array([A, B], np.uint32), label_space=space)
    assert len(uk) == 0


def test_build_db_end_to_end_with_label2(tmp_path):
    """Shared sequence between two chromosome-labeled genomes lands under
    the centromere target; a read from the shared region assigns to it."""
    import random

    from cuclark_tpu.config import ClassifyConfig
    from cuclark_tpu.pipeline import Classifier

    rng = random.Random(99)
    shared = "".join(rng.choice("ACGT") for _ in range(300))
    uniq1 = "".join(rng.choice("ACGT") for _ in range(1000))
    uniq2 = "".join(rng.choice("ACGT") for _ in range(1000))
    (tmp_path / "c1.fa").write_text(f">c1\n{uniq1}{shared}\n")
    (tmp_path / "c2.fa").write_text(f">c2\n{shared}{uniq2}\n")
    t = tmp_path / "targets.txt"
    t.write_text(f"{tmp_path / 'c1.fa'} chrXA chrXC\n"
                 f"{tmp_path / 'c2.fa'} chrXB chrXC\n")
    db = build_db(parse_targets_file(t), DBConfig(k=21))
    assert db.target_names == ["NA", "chrXA", "chrXB", "chrXC"]

    clf = Classifier(db, ClassifyConfig(batch_reads=4))
    rows = list(clf.classify_records([
        ("shared_read", shared[50:150].encode()),
        ("u1_read", uniq1[100:200].encode()),
        ("u2_read", uniq2[100:200].encode()),
    ]))
    byname = {r["name"]: r for r in rows}
    assert db.target_names[byname["shared_read"]["index_best"]] == "chrXC"
    assert db.target_names[byname["u1_read"]["index_best"]] == "chrXA"
    assert db.target_names[byname["u2_read"]["index_best"]] == "chrXB"


def test_oracle_multiplicity_sequence_order():
    """Multiplicity follows occurrence ORDER: first-seen label is sticky.

    k-mer seen first in chr1B, then once in chr1A -> mult 2, relabeled;
    the same pair seen with an extra chr1B occurrence stays mult 2
    (same-label occurrences never bump multiplicity)."""
    space = LabelSpace([("f1", "chr1A", "chr1C"), ("f2", "chr1B", None)])
    A, B = space.ids["chr1A"], space.ids["chr1B"]
    C = space.c_ids["chr1C"]
    kmers = np.array([7, 7, 7, 7], dtype=np.uint64)
    labels = np.array([B, B, A, B], dtype=np.uint32)
    # occurrences: B (insert, mult 1), B (+0), A (sibling +1 -> 2), B (+0)
    uk, ul, uc = discriminate(kmers, labels, label_space=space)
    np.testing.assert_array_equal(uk, [7])
    np.testing.assert_array_equal(ul, [C])
    np.testing.assert_array_equal(uc, [4])
