"""DB-part streaming (swap-cycle analog) must match the resident path."""

import random

import pytest

from cuclark_tpu.config import ClassifyConfig, DBConfig
from cuclark_tpu.db_build.builder import build_db
from cuclark_tpu.pipeline import Classifier


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream")
    rng = random.Random(21)
    genomes = {}
    file_labels = []
    for t in (1, 2, 3):
        g = "".join(rng.choice("ACGT") for _ in range(3000))
        genomes[t] = g
        p = tmp / f"g{t}.fa"
        p.write_text(f">g{t}\n{g}\n")
        file_labels.append((str(p), f"T{t}"))
    db = build_db(file_labels, DBConfig(k=21))
    reads = []
    for i in range(70):
        t = rng.randrange(1, 4)
        pos = rng.randrange(0, 2900 - 100)
        reads.append((f"r{i}", genomes[t][pos: pos + 100].encode()))
    fq = tmp / "reads.fq"
    fq.write_text("".join(
        f"@{n}\n{s.decode()}\n+\n{'I' * len(s)}\n" for n, s in reads))
    return db, reads, fq


def test_streaming_matches_resident(setup):
    db, reads, fq = setup
    resident = Classifier(db, ClassifyConfig(batch_reads=16))
    want = list(resident.classify_file(fq))
    # force 4+ parts by setting a tiny device budget
    streaming = Classifier(db, ClassifyConfig(
        batch_reads=16, max_table_mb=db.table.nbytes / 4e6, stream_group=2))
    assert streaming.stream_parts >= 4
    got = list(streaming.classify_file(fq))
    assert got == want


def test_streaming_records_path(setup):
    db, reads, fq = setup
    resident = Classifier(db, ClassifyConfig(batch_reads=32))
    want = list(resident.classify_records(iter(reads)))
    streaming = Classifier(db, ClassifyConfig(
        batch_reads=32, max_table_mb=db.table.nbytes / 2e6))
    got = list(streaming.classify_records(iter(reads)))
    assert got == want


def test_streaming_extended(setup):
    db, reads, fq = setup
    resident = Classifier(db, ClassifyConfig(batch_reads=16, extended=True))
    want = list(resident.classify_file(fq))
    streaming = Classifier(db, ClassifyConfig(
        batch_reads=16, extended=True,
        max_table_mb=db.table.nbytes / 4e6))
    got = list(streaming.classify_file(fq))
    assert got == want


def test_streaming_composes_with_mesh(setup):
    """Parts stream host->mesh while each part row-shards over 'db' and
    batches shard over 'data' — must match the resident single-chip
    path exactly (reference cycles x devices x parts,
    src/CuClarkDB.cu:540-574, 813-858)."""
    import jax

    from cuclark_tpu.parallel.mesh import make_mesh

    db, reads, fq = setup
    resident = Classifier(db, ClassifyConfig(batch_reads=16))
    want = list(resident.classify_file(fq))
    mesh = make_mesh(num_db=2, num_data=4, devices=jax.devices()[:8])
    clf = Classifier(db, ClassifyConfig(
        batch_reads=16, max_table_mb=db.table.nbytes / 8e6, stream_group=2),
        mesh=mesh)
    assert clf.stream_parts > 1 and clf.mesh is mesh
    got = list(clf.classify_file(fq))
    assert got == want


def test_streaming_mesh_records_and_extended(setup):
    import jax

    from cuclark_tpu.parallel.mesh import make_mesh

    db, reads, fq = setup
    resident = Classifier(db, ClassifyConfig(batch_reads=32, extended=True))
    want = list(resident.classify_records(iter(reads)))
    mesh = make_mesh(num_db=4, num_data=2, devices=jax.devices()[:8])
    clf = Classifier(db, ClassifyConfig(
        batch_reads=32, extended=True,
        max_table_mb=db.table.nbytes / 16e6), mesh=mesh)
    assert clf.stream_parts > 1
    got = list(clf.classify_records(iter(reads)))
    assert got == want


def test_streaming_csv_native_path_byte_identical(setup, tmp_path):
    """Streaming mode now rides the native CSV writer: its file output
    must be byte-identical to resident-mode classify_file_to_csv."""
    db, reads, fq = setup
    res_csv = tmp_path / "resident.csv"
    str_csv = tmp_path / "streaming.csv"
    resident = Classifier(db, ClassifyConfig(batch_reads=16))
    n1 = resident.classify_file_to_csv(fq, res_csv)
    streaming = Classifier(db, ClassifyConfig(
        batch_reads=16, max_table_mb=db.table.nbytes / 4e6, stream_group=2))
    assert streaming.stream_parts >= 4
    n2 = streaming.classify_file_to_csv(fq, str_csv)
    assert n1 == n2 == 70
    assert res_csv.read_bytes() == str_csv.read_bytes()


def test_streaming_csv_extended_byte_identical(setup, tmp_path):
    db, reads, fq = setup
    res_csv = tmp_path / "resident.csv"
    str_csv = tmp_path / "streaming.csv"
    resident = Classifier(db, ClassifyConfig(batch_reads=16, extended=True))
    resident.classify_file_to_csv(fq, res_csv)
    streaming = Classifier(db, ClassifyConfig(
        batch_reads=16, extended=True,
        max_table_mb=db.table.nbytes / 4e6, stream_group=2))
    assert streaming.stream_parts >= 4
    streaming.classify_file_to_csv(fq, str_csv)
    assert res_csv.read_bytes() == str_csv.read_bytes()
