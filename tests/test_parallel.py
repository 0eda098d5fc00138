"""Mesh sharding tests on the virtual 8-device CPU mesh.

Validates the replacement of the reference's multi-GPU DB-part +
merge-tree machinery: DB bucket-range sharding with psum merge must be
bit-identical to the single-device result for any mesh shape.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cuclark_tpu import codec
from cuclark_tpu.config import DBConfig
from cuclark_tpu.db_build.builder import build_db
from cuclark_tpu.parallel.mesh import ShardedClassifier, make_mesh
from cuclark_tpu.pipeline import classify_step

K = 21


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    import random

    tmp = tmp_path_factory.mktemp("mesh")
    rng = random.Random(3)
    file_labels = []
    for t in range(4):
        p = tmp / f"g{t}.fa"
        seq = "".join(rng.choice("ACGT") for _ in range(2000))
        p.write_text(f">g{t}\n{seq}\n")
        file_labels.append((str(p), f"T{t}"))
    return build_db(file_labels, DBConfig(k=K, slots=4))


@pytest.fixture(scope="module")
def reads(db):
    import random

    rng = random.Random(5)
    R, L = 32, 96
    codes = np.full((R, L), codec.INVALID, dtype=np.uint8)
    for i in range(R):
        seq = "".join(rng.choice("ACGTN" if i % 4 == 0 else "ACGT") for _ in range(L))
        codes[i] = codec.encode_ascii(seq.encode())
    return codes


def single_device_results(db, codes):
    results, labels = classify_step(
        jnp.asarray(db.table), jnp.asarray(codes),
        k=db.k, nb_bits=db.nb_bits, slots=db.slots,
        num_choices=db.num_choices, layout=db.layout, seed=db.seed,
        stash_bits=db.stash_bits,
    )
    return np.asarray(results), np.asarray(labels)


@pytest.mark.parametrize("num_db,num_data", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_single(db, reads, num_db, num_data):
    assert jax.device_count() == 8
    want_res, want_lab = single_device_results(db, reads)
    mesh = make_mesh(num_db=num_db, num_data=num_data)
    clf = ShardedClassifier(db, mesh)
    got_res, got_lab = clf.classify_codes(reads)
    np.testing.assert_array_equal(got_lab, want_lab)
    np.testing.assert_array_equal(got_res, want_res)


def test_uneven_batch_padding(db, reads):
    mesh = make_mesh(num_db=2, num_data=4)
    clf = ShardedClassifier(db, mesh)
    got_res, _ = clf.classify_codes(reads[:30])  # 30 not divisible by 4
    want_res, _ = single_device_results(db, reads[:30])
    np.testing.assert_array_equal(got_res, want_res)


def test_mesh_classifier_pipeline_matches_single(db, tmp_path):
    """The CLI-reachable mesh path: Classifier(mesh=...) end-to-end CSV
    equals the single-device Classifier's output."""
    import random

    from cuclark_tpu.config import ClassifyConfig
    from cuclark_tpu.pipeline import Classifier

    rng = random.Random(11)
    reads_path = tmp_path / "reads.fa"
    with open(reads_path, "w") as f:
        for i in range(53):  # not divisible by any axis
            seq = "".join(rng.choice("ACGTN" if i % 7 == 0 else "ACGT")
                          for _ in range(rng.randint(40, 180)))
            f.write(f">r{i}\n{seq}\n")

    cfg = ClassifyConfig(batch_reads=16)
    single = list(Classifier(db, cfg).classify_file(str(reads_path)))
    mesh = make_mesh(num_db=2, num_data=4)
    sharded = list(Classifier(db, cfg, mesh=mesh).classify_file(str(reads_path)))
    assert sharded == single


def test_mesh_classifier_extended_labels(db, tmp_path):
    import random

    from cuclark_tpu.config import ClassifyConfig
    from cuclark_tpu.pipeline import Classifier

    rng = random.Random(13)
    reads_path = tmp_path / "reads.fa"
    with open(reads_path, "w") as f:
        for i in range(10):
            seq = "".join(rng.choice("ACGT") for _ in range(100))
            f.write(f">r{i}\n{seq}\n")
    cfg = ClassifyConfig(batch_reads=8, extended=True)
    single = list(Classifier(db, cfg).classify_file(str(reads_path)))
    mesh = make_mesh(num_db=4, num_data=2)
    sharded = list(Classifier(db, cfg, mesh=mesh).classify_file(str(reads_path)))
    assert sharded == single


def test_cli_devices_flag(db, tmp_path):
    """classify -d 0 picks a mesh over all (virtual) devices and matches
    the single-device CSV byte-for-byte."""
    import random

    from cuclark_tpu.cli import main
    from cuclark_tpu.db_build.builder import db_name

    dbdir = tmp_path / "db"
    dbdir.mkdir()
    db.save(dbdir / db_name(DBConfig(k=K, slots=4), db.num_targets))
    rng = random.Random(17)
    reads_path = tmp_path / "reads.fa"
    with open(reads_path, "w") as f:
        for i in range(41):
            seq = "".join(rng.choice("ACGT") for _ in range(120))
            f.write(f">r{i}\n{seq}\n")
    out1 = tmp_path / "single.csv"
    outn = tmp_path / "mesh.csv"
    assert main(["classify", "-D", str(dbdir), "-O", str(reads_path),
                 "-R", str(out1)]) == 0
    assert main(["classify", "-D", str(dbdir), "-O", str(reads_path),
                 "-R", str(outn), "-d", "0"]) == 0
    assert outn.read_bytes() == out1.read_bytes()


def test_local_rows_dedups_db_replicas():
    """Results are replicated along 'db'; local_rows must keep one
    shard per data block — concatenating replicas hands later reads
    earlier reads' rows (round-4 regression, masked by uniform-read
    test data)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cuclark_tpu.parallel.mesh import ShardedClassifier, make_mesh

    mesh = make_mesh(num_db=4, num_data=2, devices=jax.devices()[:8])
    x = np.arange(16, dtype=np.int32).reshape(16, 1)
    arr = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    rows = ShardedClassifier.local_rows(arr)
    np.testing.assert_array_equal(rows, x)
    np.testing.assert_array_equal(
        ShardedClassifier.local_rows(arr, 10), x[:10])
