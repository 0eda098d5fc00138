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
        num_choices=db.num_choices,
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
