"""Native C++ host module vs numpy/oracle implementations."""

import numpy as np
import pytest

from cuclark_tpu import native
from cuclark_tpu.db_build.builder import (
    extract_canonical_light_np,
    extract_canonical_np,
)
from cuclark_tpu.io import fast_parse
from tests import oracle

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def test_scan_fastq_matches_numpy():
    text = ("@r1 d\nACGTN\n+\nIIIII\n@r2\tx\nGGGGA\n+z\nIIIII\n@r3\nTT\n+\nII\n")
    buf = np.frombuffer(text.encode(), np.uint8)
    got = native.scan(buf)
    want = fast_parse.scan_fastq(buf)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_scan_fasta_matches_numpy():
    text = ">s1 d\nACGT\nTTGG\n>s2\nNNACGT\n>s3 x\nG\n"
    buf = np.frombuffer(text.encode(), np.uint8)
    gn, ge, gs, gse = native.scan(buf)
    wn, we, ws, wse = fast_parse.scan_fasta(buf)
    np.testing.assert_array_equal(gn, wn)
    np.testing.assert_array_equal(ge, we)
    np.testing.assert_array_equal(gs, ws)
    # fasta seq_e may differ by trailing-newline trimming; compare packs
    gcodes, glen = native.pack_block(buf, gs, gse, 16)
    wcodes, wlen = fast_parse.pack_block(buf, ws, wse, 16)
    np.testing.assert_array_equal(gcodes, wcodes)
    np.testing.assert_array_equal(glen, wlen)


def test_pack_block_matches_numpy():
    text = "@a\nACGTacgtNN\n+\nIIIIIIIIII\n@b\nGG\n+\nII\n"
    buf = np.frombuffer(text.encode(), np.uint8)
    ns, ne, ss, se = fast_parse.scan_fastq(buf)
    gcodes, glen = native.pack_block(buf, ss, se, 12, n_rows=3)
    wcodes, wlen = fast_parse.pack_block(buf, ss, se, 12, n_rows=3)
    np.testing.assert_array_equal(gcodes, wcodes)
    np.testing.assert_array_equal(glen, wlen)


@pytest.mark.parametrize("k", [5, 21, 31, 32])
def test_extract_canonical_matches_oracle(k):
    import random

    rng = random.Random(k)
    seq = "".join(rng.choice("ACGTNacgt") for _ in range(500))
    got = native.extract_canonical(seq.encode(), k)
    want = np.array(oracle.read_kmers(seq, k), dtype=np.uint64)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(extract_canonical_np(seq.encode(), k), want)


@pytest.mark.parametrize("k,gap", [(7, 2), (27, 4)])
def test_extract_canonical_light_matches_oracle(k, gap):
    import random

    rng = random.Random(k * gap)
    seq = "".join(rng.choice("ACGTNACGT") for _ in range(800))
    want, want_it = oracle.light_kmers(seq, k, gap, 0)
    got, got_it = native.extract_canonical_light(seq.encode(), k, gap, 0)
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint64))
    assert got_it == want_it
    got_np, np_it = extract_canonical_light_np(seq.encode(), k, gap, 0)
    np.testing.assert_array_equal(got_np, np.array(want, dtype=np.uint64))
    assert np_it == want_it


def test_light_iter_persists_across_sequences():
    k, gap = 5, 3
    s1, s2 = "ACGTACGTACG", "TTTTTGGGGGA"
    w1, it1 = oracle.light_kmers(s1, k, gap, 0)
    w2, it2 = oracle.light_kmers(s2, k, gap, it1)
    g1, j1 = native.extract_canonical_light(s1.encode(), k, gap, 0)
    g2, j2 = native.extract_canonical_light(s2.encode(), k, gap, j1)
    assert j1 == it1 and j2 == it2
    np.testing.assert_array_equal(g1, np.array(w1, dtype=np.uint64))
    np.testing.assert_array_equal(g2, np.array(w2, dtype=np.uint64))


def test_native_q4_build_matches_numpy_probe():
    """Native and numpy q4 builds place keys differently (iteration
    order) but must both verify and probe identically."""
    import numpy as np

    from cuclark_tpu import native
    from cuclark_tpu.config import DBConfig
    from cuclark_tpu.hashdb import _try_build_q4, choose_nb_bits

    if not native.available():
        import pytest

        pytest.skip("no native module")
    rng = np.random.default_rng(0)
    km = np.unique(rng.integers(0, 1 << 60, size=60000, dtype=np.uint64))
    labels = rng.integers(1, 100, size=len(km)).astype(np.uint32)
    names = ["NA"] + [f"T{i}" for i in range(1, 100)]
    cfg = DBConfig(k=31, layout="q4", target_load=0.85)
    bits = choose_nb_bits(len(km), cfg)
    db = _try_build_q4(km, labels, names, cfg, bits, seed=1)
    assert db is not None
    db.verify(km, labels, sample=None)
    # misses return 0
    q = rng.integers(0, 1 << 60, size=10000, dtype=np.uint64)
    q = q[~np.isin(q, km)]
    assert (db.probe_np(q) == 0).all()


def test_pack_block2_matches_two_pass():
    from cuclark_tpu import codec

    text = ("@a\nACGTacgtNNACGTA\n+\nIIIIIIIIIIIIIII\n@b\nGG\n+\nII\n"
            "@c\nTTTTTTTTTTTTTTTTTTTTT\n+\nIIIIIIIIIIIIIIIIIIIII\n")
    buf = np.frombuffer(text.encode(), np.uint8)
    ns, ne, ss, se = fast_parse.scan_fastq(buf)
    for L, n_rows in ((12, 3), (16, 5), (27, 3)):
        p2, vb, ln = native.pack_block2(buf, ss, se, L, n_rows=n_rows)
        # the dispatch fallback packs AT max_len (padding to Lp is
        # all-invalid), and the native path must match bit-for-bit —
        # including non-multiple-of-8 widths
        codes, ln2 = fast_parse.pack_block(buf, ss, se, L, n_rows=n_rows)
        w2, wv = codec.pack_codes(codes)
        np.testing.assert_array_equal(p2, w2)
        np.testing.assert_array_equal(vb, wv)
        np.testing.assert_array_equal(ln, ln2)


def test_pack_block2_multiline_fasta():
    from cuclark_tpu import codec

    text = ">s1\nACGT\nTTGG\nAC\n>s2\nNNAC\nGT\n"
    buf = np.frombuffer(text.encode(), np.uint8)
    ns, ne, ss, se = native.scan(buf)
    p2, vb, ln = native.pack_block2(buf, ss, se, 16)
    codes, ln2 = native.pack_block(buf, ss, se, 16)
    w2, wv = codec.pack_codes(codes)
    np.testing.assert_array_equal(p2, w2)
    np.testing.assert_array_equal(vb, wv)
    np.testing.assert_array_equal(ln, ln2)


def test_reduce_occurrences_matches_numpy():
    """Native radix-sort reduce == the numpy argsort/reduceat path."""
    import os

    from cuclark_tpu.db_build import builder

    rng = np.random.default_rng(3)
    n = 200_000
    kmers = rng.integers(0, 1 << 42, size=n, dtype=np.uint64)
    # force duplicate k-mers with mixed labels
    kmers[n // 2:] = kmers[: n // 2]
    labels = rng.integers(1, 50, size=n).astype(np.uint32)
    labels[n // 2: n // 2 + n // 4] = labels[: n // 4]  # some same-label dups
    counts = rng.integers(1, 5, size=n).astype(np.uint32)

    for ct in (None, counts):
        for mc in (0, 2):
            got = native.reduce_occurrences(kmers, labels, ct, mc)
            os.environ["CUCLARK_NO_NATIVE"] = "1"
            try:
                import importlib

                native._LIB, native._TRIED = None, True
                want = builder.discriminate(kmers, labels, mc, ct)
            finally:
                del os.environ["CUCLARK_NO_NATIVE"]
                native._TRIED = False
            np.testing.assert_array_equal(got[0], want[0])
            np.testing.assert_array_equal(got[1], want[1].astype(np.uint32))
            np.testing.assert_array_equal(got[2], want[2].astype(np.uint32))


def test_reduce_occurrences_count_saturation():
    """Totals clamp at u32 max like the numpy path."""
    kmers = np.array([7, 7, 9], np.uint64)
    labels = np.array([3, 3, 4], np.uint32)
    counts = np.array([0xFFFFFFFF, 5, 1], np.uint32)
    km, lb, ct = native.reduce_occurrences(kmers, labels, counts, 0)
    np.testing.assert_array_equal(km, [7, 9])
    np.testing.assert_array_equal(lb, [3, 4])
    np.testing.assert_array_equal(ct, [0xFFFFFFFF, 1])


def test_pack_block2_paired_matches_fallback():
    """Fused native mate1+N+mate2 wire packing == the numpy detour
    (pack + shift-merge + re-pack), including truncation, ragged-row
    padding, and embedded Ns."""
    from cuclark_tpu import codec

    t1 = ("@a\nACGTACGTACGT\n+\nIIIIIIIIIIII\n@b\nGGNNCC\n+\nIIIIII\n"
          "@c\nTTTT\n+\nIIII\n")
    t2 = ("@a\nTTAA\n+\nIIII\n@b\nCCCCCCCCCC\n+\nIIIIIIIIII\n"
          "@c\nAAC\n+\nIII\n")
    b1 = np.frombuffer(t1.encode(), np.uint8)
    b2 = np.frombuffer(t2.encode(), np.uint8)
    _, _, s1, e1 = fast_parse.scan_fastq(b1)
    _, _, s2, e2 = fast_parse.scan_fastq(b2)
    for L, n_rows in ((16, 3), (24, 5), (8, 3)):
        got = native.pack_block2_paired(b1, s1, e1, b2, s2, e2, L,
                                        n_rows=n_rows)
        Lp = -(-L // 8) * 8
        codes1, len1 = fast_parse.pack_block(b1, s1, e1, Lp, n_rows=n_rows)
        codes, ln2 = fast_parse.merge_paired_codes(
            codes1, len1, b2, s2, e2, Lp)
        ln2[len(s1):] = 0  # padding rows carry no joining 'N'
        w2, wv = codec.pack_codes(codes)
        np.testing.assert_array_equal(got[0], w2)
        np.testing.assert_array_equal(got[1], wv)
        np.testing.assert_array_equal(got[2], ln2)


def test_scan_malformed_fastq_raises():
    """A mid-file line that is not a record header raises (both
    scanners) instead of silently skipping the remainder / frame-
    shifting."""
    import pytest

    bad = np.frombuffer(
        b"@a\nACGT\n+\nIIII\n\njunk\n@b\nGGGG\n+\nIIII\n", np.uint8)
    with pytest.raises(ValueError, match="malformed FASTQ"):
        native.scan(bad)
    with pytest.raises(ValueError, match="malformed FASTQ"):
        fast_parse.scan_fastq(bad)


def test_scan_truncated_fastq_drops_partial_tail():
    """A file truncated mid-record drops the partial record in BOTH
    scanners (paired-count checks must not flip on native
    availability)."""
    for tail in (b"@c\nAC", b"@c\nACGT\n", b"@c\nACGT\n+\n"):
        buf = np.frombuffer(b"@a\nACGT\n+\nIIII\n" + tail, np.uint8)
        r_nat = len(native.scan(buf)[0])
        r_np = len(fast_parse.scan_fastq(buf)[0])
        assert r_nat == r_np == 1, (tail, r_nat, r_np)
    # a final record missing only the trailing newline is KEPT by both
    buf = np.frombuffer(b"@a\nACGT\n+\nIIII\n@c\nAC\n+\nII", np.uint8)
    assert len(native.scan(buf)[0]) == len(fast_parse.scan_fastq(buf)[0]) == 2


def test_scan_grows_past_record_size_guess():
    """Header-only FASTA records are smaller than the capacity guess;
    the wrapper must grow and rescan, not silently drop the tail."""
    data = b">a\n" * 500  # 3 bytes/record < n//4 guess
    buf = np.frombuffer(data, np.uint8)
    ns, ne, ss, se = native.scan(buf)
    assert len(ns) == 500


def test_crlf_names_have_no_carriage_return():
    """Windows line endings must not leak '\\r' into read names (it
    would corrupt CSV rows) — native and numpy agree."""
    data = b"@read1\r\nACGT\r\n+\r\nIIII\r\n@read2 x\r\nGGGG\r\n+\r\nIIII\r\n"
    buf = np.frombuffer(data, np.uint8)
    for ns, ne in (native.scan(buf)[:2], fast_parse.scan_fastq(buf)[:2]):
        names = fast_parse.names_of(buf, ns, ne)
        assert names == ["read1", "read2"], names
    data2 = b">seq1\r\nACGT\r\n>seq2 d\r\nGGGG\r\n"
    buf2 = np.frombuffer(data2, np.uint8)
    for ns, ne in (native.scan(buf2)[:2], fast_parse.scan_fasta(buf2)[:2]):
        assert fast_parse.names_of(buf2, ns, ne) == ["seq1", "seq2"]


def test_scan_fasta_truncated_header_no_crash():
    """A FASTA ending in a bare header (no newline) parses instead of
    IndexError-ing in the numpy scanner."""
    buf = np.frombuffer(b">s1\nACGT\n>s2", np.uint8)
    for scanner in (fast_parse.scan_fasta, native.scan):
        ns, ne, ss, se = scanner(buf)
        assert fast_parse.names_of(buf, ns, ne)[0] == "s1"


def test_scan_fasta_truncated_header_packs_safely():
    """The header-only final record yields an EMPTY in-bounds seq range
    (seq_s <= seq_e <= len) in BOTH scanners, so the packers get a
    zero-length row instead of IndexError / length -1 (a truncated
    download must degrade, not crash the classify run)."""
    for data in (b">a\nACGT\n>NC_0012", b">a\nACGT\n>b\n",
                 b">only_header"):
        buf = np.frombuffer(data, np.uint8)
        packed = []
        for scanner in (fast_parse.scan_fasta, native.scan):
            ns, ne, ss, se = scanner(buf)
            assert (ss <= se).all() and (se <= len(buf)).all(), data
            codes, lengths = fast_parse.pack_block(buf, ss, se, 16)
            assert (lengths >= 0).all()
            assert int(lengths[-1]) == 0  # the header-only record
            packed.append((codes.tobytes(), lengths.tolist()))
        # offsets may differ (numpy keeps the trailing newline in the
        # seq range; the packer skips it) but the packed reads agree
        assert packed[0] == packed[1], data


def test_extract_newline_parity():
    """Raw multi-line FASTA bytes yield the SAME k-mers from the native
    extractors (which skip newlines) and the numpy fallbacks (which
    previously broke the window at '\\n') — the database must not
    depend on compiler availability."""
    seq = b"ACGTACGTAC\nGTACGTNACG\r\nTACGTACGTA"
    flat = seq.replace(b"\n", b"").replace(b"\r", b"")
    for k in (5, 9):
        a = extract_canonical_np(seq, k)
        b = extract_canonical_np(flat, k)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(
            np.sort(a), np.sort(native.extract_canonical(seq, k)))
        la, _ = extract_canonical_light_np(seq, k, 2)
        lb, _ = native.extract_canonical_light(seq, k, 2)
        np.testing.assert_array_equal(np.sort(la), np.sort(lb))


def test_csv_format_locale_independent():
    """A non-C LC_NUMERIC locale must not turn %g decimal points into
    commas (which would corrupt the CSV column count) or break float
    parsing in csv_tally."""
    import locale

    try:
        locale.setlocale(locale.LC_NUMERIC, "de_DE.UTF-8")
    except locale.Error:
        import pytest

        pytest.skip("de_DE.UTF-8 locale not installed")
    try:
        buf = np.frombuffer(b"@r0\nACGT\n+\nIIII\n", np.uint8)
        ns, ne, ss, se = native.scan(buf)
        tnb, tno = native.pack_target_names(["NA", "T1"])
        out = native.format_rows(
            np.array([4], np.int64), np.array([0.125], np.float64),
            np.array([1], np.int32), np.array([3], np.int32),
            np.array([0], np.int32), np.array([0], np.int32),
            np.array([0.75], np.float64), buf, ns, ne, tnb, tno)
        assert out == b"r0,4,0.125,T1,3,NA,0,0.75\n", out
        body = np.frombuffer(b"r0,100,0.9,T1,50,NA,0,0.75\n", np.uint8)
        names, counts, total = native.csv_tally(body, 8, 3, 7, 2,
                                                0.5, 0.0)
        assert total == 1 and counts[names.index("T1")] == 1
    finally:
        locale.setlocale(locale.LC_NUMERIC, "C")
