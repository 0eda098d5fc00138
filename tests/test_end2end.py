"""End-to-end: mini DB from synthetic genomes, classify reads, compare
results and CSV lines against the pure-Python oracle."""

import random

import numpy as np
import pytest

from cuclark_tpu.config import ClassifyConfig, DBConfig
from cuclark_tpu.db_build.builder import build_db, discriminate, extract_canonical_np
from cuclark_tpu.io.csv_out import format_row
from cuclark_tpu.pipeline import Classifier
from tests import oracle

K = 27


def make_genomes(seed=42, n_targets=3, glen=3000):
    rng = random.Random(seed)
    return {
        t + 1: ["".join(rng.choice("ACGT") for _ in range(glen))]
        for t in range(n_targets)
    }


def sample_reads(genomes, n_reads=60, read_len=120, seed=1, with_junk=True):
    rng = random.Random(seed)
    reads = []
    for i in range(n_reads):
        t = rng.randrange(1, len(genomes) + 1)
        g = genomes[t][0]
        pos = rng.randrange(0, len(g) - read_len)
        seq = list(g[pos: pos + read_len])
        # mutations and N runs
        for _ in range(rng.randrange(0, 6)):
            seq[rng.randrange(read_len)] = rng.choice("ACGT")
        if with_junk and rng.random() < 0.3:
            p = rng.randrange(read_len)
            for q in range(p, min(read_len, p + rng.randrange(1, 5))):
                seq[q] = "N"
        reads.append((f"read_{i}_t{t}", "".join(seq)))
    # some fully random reads (likely NA)
    for i in range(10):
        reads.append(
            (f"junk_{i}", "".join(rng.choice("ACGT") for _ in range(read_len)))
        )
    return reads


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    genomes = make_genomes()
    file_labels = []
    for t, seqs in genomes.items():
        p = tmp / f"g{t}.fa"
        p.write_text(f">genome{t}\n" + "\n".join(seqs) + "\n")
        file_labels.append((str(p), f"TAX{t}"))
    cfg = DBConfig(k=K, slots=4, target_load=0.7)
    db = build_db(file_labels, cfg)
    odb = oracle.build_db(genomes, K)
    return genomes, db, odb


def test_db_matches_oracle(setup):
    genomes, db, odb = setup
    assert db.num_kmers == len(odb)
    assert db.target_names == ["NA", "TAX1", "TAX2", "TAX3"]


def test_extract_matches_oracle_on_genome(setup):
    genomes, db, odb = setup
    g = genomes[1][0][:500]
    got = extract_canonical_np(g.encode(), K)
    want = np.array(oracle.read_kmers(g, K), dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_classification_matches_oracle(setup):
    genomes, db, odb = setup
    reads = sample_reads(genomes)
    clf = Classifier(db, ClassifyConfig(batch_reads=32))
    rows = list(clf.classify_records((n, s.encode()) for n, s in reads))
    assert len(rows) == len(reads)
    for (name, seq), row in zip(reads, rows):
        want = oracle.classify_read(seq, odb, K, db.num_targets)
        got = (row["total"], row["index_best"], row["best"],
               row["index_second"], row["second"])
        assert got == want, f"{name}: got {got} want {want}"


def test_csv_line_parity(setup):
    genomes, db, odb = setup
    reads = sample_reads(genomes, n_reads=25, seed=5)
    clf = Classifier(db, ClassifyConfig(batch_reads=64))
    rows = list(clf.classify_records((n, s.encode()) for n, s in reads))
    for (name, seq), row in zip(reads, rows):
        t, ib, b, is2, s2 = oracle.classify_read(seq, odb, K, db.num_targets)
        want = oracle.result_line(
            name, len(seq), K, t, ib, b, is2, s2, db.target_names
        )
        got = format_row(row, db.target_names).rstrip("\n")
        assert got == want


def test_extended_counts_match_oracle(setup):
    genomes, db, odb = setup
    reads = sample_reads(genomes, n_reads=15, seed=9)
    clf = Classifier(db, ClassifyConfig(batch_reads=16, extended=True))
    rows = list(clf.classify_records((n, s.encode()) for n, s in reads))
    for (name, seq), row in zip(reads, rows):
        counts = {}
        for km in oracle.read_kmers(seq, K):
            lb = odb.get(km)
            if lb:
                counts[lb] = counts.get(lb, 0) + 1
        assert row["target_counts"] == counts


def test_paired_join_semantics(setup):
    genomes, db, odb = setup
    g = genomes[2][0]
    r1, r2 = g[100:220], g[400:520]
    merged = r1 + "N" + r2
    clf = Classifier(db, ClassifyConfig(batch_reads=4))
    row = next(clf.classify_records([("p", merged.encode())], paired=True))
    want = oracle.classify_read(merged, odb, K, db.num_targets)
    assert (row["total"], row["index_best"], row["best"]) == want[:3]
    # paired length normalization subtracts the joining N
    assert row["length"] == len(r1) + len(r2)


def test_min_count_filter():
    # reference -t is STRICT: keep k-mers with count > min_count
    # (RemoveCommon `GetCount() > _minCount`,
    # src/HashTableStorage_hh.hh:256)
    kmers = np.array([5, 5, 9, 12, 12, 12], dtype=np.uint64)
    labels = np.array([1, 1, 2, 1, 2, 1], dtype=np.uint32)
    uk, ul, uc = discriminate(kmers, labels, min_count=1)
    # kmer 12 spans two targets -> dropped; 9 count=1 -> dropped (not >1);
    # 5 count=2 > 1 -> kept
    np.testing.assert_array_equal(uk, [5])
    np.testing.assert_array_equal(ul, [1])
    np.testing.assert_array_equal(uc, [2])
    uk2, _, _ = discriminate(kmers, labels, min_count=2)
    assert len(uk2) == 0  # count 2 is not > 2


def test_spill_build_matches_in_ram(tmp_path):
    """Out-of-core (disk-shard) build must produce the identical DB as
    the in-RAM path: same discriminative k-mer set, labels, and table."""
    import random

    import dataclasses

    rng = random.Random(23)
    file_labels = []
    for t in range(3):
        p = tmp_path / f"g{t}.fa"
        seq = "".join(rng.choice("ACGT") for _ in range(4000))
        p.write_text(f">g{t}\n{seq}\n")
        file_labels.append((str(p), f"T{t}"))
    cfg = DBConfig(k=21, build_ram_mb=None)
    db_ram = build_db(file_labels, cfg)
    # zero budget: every pushed chunk spills to the disk shards
    cfg_spill = dataclasses.replace(cfg, build_ram_mb=0)
    db_spill = build_db(file_labels, cfg_spill)
    assert db_spill.num_kmers == db_ram.num_kmers
    assert db_spill.target_names == db_ram.target_names
    import numpy as np
    np.testing.assert_array_equal(db_spill.table, db_ram.table)


def test_spill_split_reduce_matches_unbounded(tmp_path):
    """A reduce budget smaller than a shard's 4x footprint must split
    shards by deeper k-mer bits and still yield the same survivors in
    the same (ascending) order."""
    import numpy as np

    from cuclark_tpu.db_build.builder import _SpillStore, discriminate

    rng = np.random.default_rng(12)
    k = 21
    n = 200_000
    # all keys in ONE top-bits shard: its file (3.2 MB) exceeds the
    # 1 MB-floor budget's /4 threshold, forcing recursive splits
    km = rng.integers(0, 1 << (2 * k - 6), size=n, dtype=np.uint64)
    third = n // 3
    km[:third] = km[third: 2 * third]  # duplicates across labels
    lb = rng.integers(1, 9, size=n).astype(np.uint32)
    ct = np.ones(n, np.uint32)

    def collect(budget):
        store = _SpillStore(str(tmp_path), k)
        # feed in several chunks to interleave shard appends
        for lo in range(0, n, 7777):
            hi = min(lo + 7777, n)
            store.add(km[lo:hi], lb[lo:hi], ct[lo:hi])
        try:
            parts = list(store.reduce(0, budget_bytes=budget))
        finally:
            store.cleanup()
        return (len(parts),
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]))

    np_ref, km_ref, lb_ref = collect(None)   # no splitting
    np_tiny, km_tiny, lb_tiny = collect(1)   # floor kicks in -> splits
    assert np_ref == 1 and np_tiny > 8       # splitting actually ran
    np.testing.assert_array_equal(km_tiny, km_ref)
    np.testing.assert_array_equal(lb_tiny, lb_ref)
    # sanity vs direct discriminate
    km_d, lb_d, _ = discriminate(km, lb, 0, ct)
    np.testing.assert_array_equal(km_ref, km_d)
    np.testing.assert_array_equal(lb_ref, lb_d)


def test_tsk_resume_rejects_mismatched_params(tmp_path):
    """A tsk archive built under different k/gap/min_count defines
    different k-mers: resuming from it must raise, not silently build a
    DB of the wrong keys."""
    import random

    import pytest

    from cuclark_tpu.db_build.builder import build_db

    rng = random.Random(71)
    g = "".join(rng.choice("ACGT") for _ in range(2000))
    p = tmp_path / "g.fa"
    p.write_text(f">g\n{g}\n")
    fl = [(str(p), "T1")]
    tsk = tmp_path / "tsk"
    db31 = build_db(fl, DBConfig(k=31), tsk_dir=tsk)
    assert db31.k == 31
    with pytest.raises(ValueError, match="tsk archive"):
        build_db(fl, DBConfig(k=27), tsk_dir=tsk)
    # matching params resume fine
    db31b = build_db(fl, DBConfig(k=31), tsk_dir=tsk)
    np.testing.assert_array_equal(db31b.table, db31.table)


def test_spill_creates_missing_base_dir(tmp_path):
    """Spilling into a not-yet-created db dir must create it, not die
    with FileNotFoundError mid-build."""
    import random

    from cuclark_tpu.db_build.builder import build_db

    rng = random.Random(72)
    g = "".join(rng.choice("ACGT") for _ in range(3000))
    p = tmp_path / "g.fa"
    p.write_text(f">g\n{g}\n")
    tsk = tmp_path / "newdir" / "tsk"  # parent does not exist yet
    db = build_db([(str(p), "T1")],
                  DBConfig(k=21, build_ram_mb=0), tsk_dir=tsk)
    assert db.num_kmers > 0


def test_rna_u_maps_to_t():
    """RNA 'U' encodes like 'T' (reference nucleotide tables,
    src/CuCLARK_hh.hh:287,295) in the codec, the native extractor, and
    the oracle — a U must not break k-mer parts."""
    from cuclark_tpu import codec, native
    from cuclark_tpu.db_build.builder import extract_canonical_np
    from tests import oracle

    dna = b"ACGTACGTACGTACGTACGTACGTA"
    rna = dna.replace(b"T", b"U")
    k = 21
    want = extract_canonical_np(dna, k)
    np.testing.assert_array_equal(extract_canonical_np(rna, k), want)
    if native.available():
        np.testing.assert_array_equal(native.extract_canonical(rna, k),
                                      want)
    assert oracle.read_kmers(rna.decode(), k) == list(want)
    np.testing.assert_array_equal(codec.encode_ascii(b"Uu"),
                                  codec.encode_ascii(b"Tt"))


def test_q_bits_lower_bound():
    """Explicit sub-17 nb_bits for q4/qs raises the clear geometry
    error (the 15-bit quotient field), not a confusing self-check
    failure."""
    import pytest

    from cuclark_tpu.hashdb import check_q_bits

    with pytest.raises(ValueError, match="nb_bits >= 17"):
        check_q_bits("q4", 16)
    with pytest.raises(ValueError, match="nb_bits >= 17"):
        check_q_bits("qs", 20, 16)
    # stash_bits == 0 (dataclass default / corrupted artifact) would
    # silently truncate stash quotients: rejected, not "fused"
    with pytest.raises(ValueError, match="stash_bits"):
        check_q_bits("qs", 20, 0)
    check_q_bits("qs", 20)  # nb_bits-only check (stash not chosen yet)
