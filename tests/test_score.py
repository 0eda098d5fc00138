"""Scoring semantics tests: tie-breaking must match the reference's
ascending-index strict-greater scan (src/CuClarkDB.cu:1440-1457)."""

import numpy as np

import jax.numpy as jnp

from cuclark_tpu.score import score_labels


def brute(labels_row, num_targets=70000):
    counts = {}
    for lb in labels_row:
        if lb > 0:
            counts[lb] = counts.get(lb, 0) + 1
    total = sum(counts.values())
    best = second = ibest = isecond = 0
    for t in sorted(counts):
        c = counts[t]
        if c > best:
            second, isecond = best, ibest
            best, ibest = c, t
        elif c > second:
            second, isecond = c, t
    return [total, ibest, best, isecond, second]


def test_matches_bruteforce_random():
    rng = np.random.default_rng(0)
    R, P = 64, 50
    labels = rng.integers(0, 6, size=(R, P)).astype(np.int32)
    got = np.asarray(score_labels(jnp.asarray(labels)))
    want = np.array([brute(row) for row in labels])
    np.testing.assert_array_equal(got, want)


def test_tie_prefers_smaller_index():
    # labels 5 and 2 each hit twice: best must be 2, second 5
    labels = np.array([[5, 2, 0, 5, 2]], dtype=np.int32)
    got = np.asarray(score_labels(jnp.asarray(labels)))[0]
    assert got.tolist() == [4, 2, 2, 5, 2]


def test_no_hits():
    labels = np.zeros((3, 10), dtype=np.int32)
    got = np.asarray(score_labels(jnp.asarray(labels)))
    np.testing.assert_array_equal(got, 0)


def test_single_target():
    labels = np.array([[0, 7, 7, 0, 7]], dtype=np.int32)
    got = np.asarray(score_labels(jnp.asarray(labels)))[0]
    assert got.tolist() == [3, 7, 3, 0, 0]


def test_three_way_tie_second_best():
    # a < b < c all equal: best=a, second=b (reference scan keeps first)
    labels = np.array([[3, 1, 2]], dtype=np.int32)
    got = np.asarray(score_labels(jnp.asarray(labels)))[0]
    assert got.tolist() == [3, 1, 1, 2, 1]


def test_large_label_values():
    labels = np.array([[65535, 65535, 65534]], dtype=np.int32)
    got = np.asarray(score_labels(jnp.asarray(labels)))[0]
    assert got.tolist() == [3, 65535, 2, 65534, 1]
