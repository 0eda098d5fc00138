"""Analyser (spectrum bump detection) vs a literal oracle of the
reference scan (src/analyser.cc:46-137)."""

import numpy as np
import pytest

from cuclark_tpu import analyser


def oracle_bump(freq, div=2):
    """Direct transliteration of analyser::getBumpInterval semantics."""
    freq = list(map(int, freq))
    unchanged = 0
    table = []
    index_s = 0
    minfound = False
    for i, v in enumerate(freq):
        if i > 0 and abs(v - freq[i - 1]) < 1:
            if unchanged < 5:
                unchanged += 1
        else:
            unchanged = 0
        if unchanged < 1:
            table.append((i, v))
            if not minfound and v > 0:
                index_s = i
                minfound = True
    n = len(table)
    if n < 3:
        return False, index_s, table[-1][0]
    out_s, out_e = index_s, table[-1][0]
    if n <= 4:
        return False, out_s, out_e
    min_val, min_idx = 999999999, 1
    max_val, max_idx = 0, 1
    min_done = max_done = False
    cpt = 1
    while cpt < n and not max_done:
        i, v = table[cpt]
        if not min_done and min_val >= v:
            min_val, min_idx = v, i
        step = int(0.5 * min_idx) if 0.5 * min_idx >= 2 else 2
        min_done = i - min_idx >= step
        if not max_done and min_done and max_val < v:
            max_val, max_idx = v, i
        max_done = min_done and (i - max_idx >= max_idx - min_idx)
        cpt += 1
    if max_done:
        return (True, max_idx - (max_idx - min_idx) // div,
                max_idx + (max_idx - min_idx) // div)
    return False, out_s, out_e


def test_error_bump_spectrum():
    # error spike at 1, valley ~6, coverage bump ~12
    freq = [0, 1000, 400, 150, 60, 30, 20, 18, 25, 40, 60, 80,
            90, 80, 60, 40, 20, 10, 5, 2, 1]
    found, lo, hi = analyser.bump_interval(np.array(freq))
    assert (found, lo, hi) == oracle_bump(freq)
    assert found
    assert lo <= 12 <= hi


def test_short_histogram_no_bump():
    for freq in ([0], [0, 5], [0, 5, 5, 5], [0, 3, 2, 1]):
        found, lo, hi = analyser.bump_interval(np.array(freq))
        o = oracle_bump(freq)
        assert (found, lo, hi) == o
        assert not found


def test_matches_oracle_random():
    rng = np.random.default_rng(7)
    for _ in range(200):
        n = int(rng.integers(1, 60))
        freq = rng.integers(0, 8, size=n).astype(np.int64)
        # sprinkle plateaus
        if n > 4:
            freq[2:5] = freq[1]
        got = analyser.bump_interval(freq)
        assert got == oracle_bump(freq), freq.tolist()


def test_compact_plateaus():
    idx, val = analyser.compact_plateaus(np.array([3, 3, 3, 5, 5, 2]))
    assert idx.tolist() == [0, 3, 5]
    assert val.tolist() == [3, 5, 2]


def test_spectrum_histogram_and_cli(tmp_path, capsys):
    sp = tmp_path / "spec.txt"
    lines = []
    # 4 k-mers at count 1, 2 at count 3
    for i, c in enumerate([1, 1, 1, 1, 3, 3]):
        lines.append(f"{'ACGT' * 7}{'ACGT'[i % 4]}{'A' * 2} {c}")
    sp.write_text("\n".join(lines) + "\n")
    freq = analyser.spectrum_histogram(sp)
    assert freq.tolist() == [0, 4, 0, 2]

    from cuclark_tpu.cli import main

    assert main(["analyze", "-i", str(sp)]) == 0
    out = capsys.readouterr().out
    assert "spectrum: 6 k-mers" in out


def test_bad_spectrum_line(tmp_path):
    sp = tmp_path / "bad.txt"
    sp.write_text("AAAA 1 2\n")
    with pytest.raises(ValueError):
        analyser.spectrum_histogram(sp)
