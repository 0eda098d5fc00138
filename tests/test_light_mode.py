"""Light-mode (cuCLARK-l analog) end-to-end vs oracle."""

import random

import pytest

from cuclark_tpu.cli import main
from cuclark_tpu.config import ClassifyConfig, DBConfig
from cuclark_tpu.db_build.builder import build_db
from cuclark_tpu.hashdb import KmerDB
from cuclark_tpu.pipeline import Classifier
from tests import oracle

K = 27
GAP = 4


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("light")
    rng = random.Random(123)
    genomes = {}
    file_labels = []
    for t in (1, 2, 3):
        g = "".join(rng.choice("ACGT") for _ in range(6000))
        genomes[t] = g
        p = tmp / f"g{t}.fa"
        # multi-line fasta with some Ns
        gg = g[:2000] + "NN" + g[2000:]
        body = "\n".join(gg[j: j + 70] for j in range(0, len(gg), 70))
        p.write_text(f">chr{t}\n{body}\n")
        file_labels.append((str(p), f"L{t}"))
    db = build_db(file_labels, DBConfig(k=K, gap=GAP))
    odb = oracle.build_db(
        {t: [genomes[t][:2000] + "NN" + genomes[t][2000:]] for t in genomes},
        K, gap=GAP)
    return tmp, genomes, db, odb


def test_light_db_matches_oracle(setup):
    tmp, genomes, db, odb = setup
    assert db.num_kmers == len(odb)
    # light DB is ~4k times smaller than genomes' overlapping k-mer count
    assert db.num_kmers < 6000 * 3 / (K * GAP) * 1.2


def test_light_classification_matches_oracle(setup):
    tmp, genomes, db, odb = setup
    rng = random.Random(5)
    clf = Classifier(db, ClassifyConfig(batch_reads=32))
    reads = []
    for i in range(40):
        t = rng.randrange(1, 4)
        pos = rng.randrange(0, 5800)
        reads.append((f"r{i}", genomes[t][pos: pos + 150]))
    rows = list(clf.classify_records((n, s.encode()) for n, s in reads))
    for (name, seq), row in zip(reads, rows):
        want = oracle.classify_read(seq, odb, K, db.num_targets)
        got = (row["total"], row["index_best"], row["best"],
               row["index_second"], row["second"])
        assert got == want


def test_cli_light_preset(tmp_path):
    rng = random.Random(9)
    g = "".join(rng.choice("ACGT") for _ in range(4000))
    (tmp_path / "g.fa").write_text(f">g\n{g}\n")
    (tmp_path / "targets.txt").write_text(f"{tmp_path}/g.fa X\n")
    rc = main(["build-db", "-T", str(tmp_path / "targets.txt"),
               "-D", str(tmp_path / "db"), "--light"])
    assert rc == 0
    db = KmerDB.load(next((tmp_path / "db").glob("db_k*.npz")))
    assert db.k == 27 and db.gap == 4
