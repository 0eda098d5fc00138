"""Codec unit tests vs the pure-Python oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from cuclark_tpu import codec, u64
from tests import oracle


def rand_seq(rng, n, alphabet="ACGT"):
    return "".join(rng.choice(list(alphabet)) for _ in range(n))


def test_string_roundtrip():
    s = "ACGTTGCAAACGT"
    v = codec.string_to_kmer(s)
    assert v == oracle.kmer_value(s)
    assert codec.kmer_to_string(v, len(s)) == s


@pytest.mark.parametrize("k", [2, 5, 16, 27, 31, 32])
def test_revcomp_np_matches_oracle(k):
    rng = np.random.default_rng(k)
    vals = rng.integers(0, 1 << min(2 * k, 63), size=100, dtype=np.uint64)
    vals &= np.uint64((1 << (2 * k)) - 1) if 2 * k < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    got = codec.revcomp_np(vals, k)
    want = np.array([oracle.revcomp_value(int(v), k) for v in vals], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [5, 27, 31])
def test_revcomp_device_matches_np(k):
    rng = np.random.default_rng(k + 100)
    vals = (rng.integers(0, 1 << 62, size=64, dtype=np.uint64)
            & np.uint64((1 << (2 * k)) - 1))
    pair = u64.from_np64(vals)
    got = u64.to_np64(codec.revcomp(pair, k))
    np.testing.assert_array_equal(got, codec.revcomp_np(vals, k))


def test_revcomp_is_involution():
    k = 31
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 62, size=50, dtype=np.uint64)
    assert np.array_equal(codec.revcomp_np(codec.revcomp_np(vals, k), k), vals)


@pytest.mark.parametrize("k", [2, 3, 8, 15, 27, 31, 32])
def test_extract_kmers_vs_oracle(k):
    import random

    rng = random.Random(k)
    seqs = []
    for _ in range(20):
        n = rng.randrange(0, 90)
        s = "".join(rng.choice("ACGTNacgtn") for _ in range(n))
        seqs.append(s)
    L = 96
    codes = np.full((len(seqs), L), codec.INVALID, dtype=np.uint8)
    for i, s in enumerate(seqs):
        enc = codec.encode_ascii(s.encode())
        codes[i, : len(enc)] = enc

    (khi, klo), valid = codec.extract_kmers(jnp.asarray(codes), k)
    chi, clo = codec.canonical((khi, klo), k)
    can = u64.to_np64((chi, clo))
    valid = np.asarray(valid)

    for i, s in enumerate(seqs):
        got = can[i][valid[i]]
        want = np.array(oracle.read_kmers(s, k), dtype=np.uint64)
        np.testing.assert_array_equal(got, want, err_msg=f"seq {i}: {s!r}")


def test_extract_kmers_forward_values():
    # Forward (non-canonical) values must equal the oracle's kmer_value.
    k = 7
    s = "ACGTACGTTT"
    codes = codec.encode_ascii(s.encode())[None, :]
    (khi, klo), valid = codec.extract_kmers(jnp.asarray(codes), k)
    fwd = u64.to_np64((khi, klo))[0]
    for p in range(len(s) - k + 1):
        assert fwd[p] == oracle.kmer_value(s[p:p + k])
        assert np.asarray(valid)[0, p]


@pytest.mark.parametrize("L", [7, 8, 100, 128, 256])
def test_pack_unpack_roundtrip(L):
    rng = np.random.default_rng(L)
    codes = rng.integers(0, 5, size=(13, L)).astype(np.uint8)  # incl INVALID
    packed2, vbits = codec.pack_codes(codes)
    Lp = -(-L // 8) * 8
    assert packed2.shape == (13, Lp // 4)
    assert vbits.shape == (13, Lp // 8)
    back = np.asarray(codec.unpack_codes(jnp.asarray(packed2),
                                         jnp.asarray(vbits)))
    assert back.shape == (13, Lp)
    np.testing.assert_array_equal(back[:, :L], codes)
    # padding positions restore as INVALID
    assert (back[:, L:] == codec.INVALID).all()


def test_packed_classify_matches_unpacked():
    from cuclark_tpu.config import DBConfig
    from cuclark_tpu.hashdb import build_table
    from cuclark_tpu.pipeline import classify_step, classify_step_packed

    k = 27
    rng = np.random.default_rng(0)
    km = np.unique(rng.integers(0, 1 << (2 * k - 2), size=512,
                                dtype=np.uint64))
    km = np.unique(codec.canonical_np(km, k))
    labels = rng.integers(1, 9, size=len(km)).astype(np.uint32)
    db = build_table(km, labels, ["NA"] + [f"T{i}" for i in range(1, 9)],
                     DBConfig(k=k, slots=4))
    codes = rng.integers(0, 5, size=(32, 96)).astype(np.uint8)
    table = jnp.asarray(db.table)
    kw = dict(k=db.k, nb_bits=db.nb_bits, slots=db.slots,
              num_choices=db.num_choices, layout=db.layout, seed=db.seed,
              stash_bits=db.stash_bits)
    res_u, lab_u = classify_step(table, jnp.asarray(codes), **kw)
    p2, vb = codec.pack_codes(codes)
    res_p, lab_p = classify_step_packed(table, jnp.asarray(p2),
                                        jnp.asarray(vb), **kw)
    np.testing.assert_array_equal(np.asarray(res_u), np.asarray(res_p))
    np.testing.assert_array_equal(np.asarray(lab_u), np.asarray(lab_p))
