"""abundance / density result-CSV summaries (the CLARK-side
estimate_abundance.sh / evaluate_density_*.sh companions, reference
README.md:77-80)."""

import pytest

from cuclark_tpu.cli import main

HEADER = ("Object_ID,Length,Gamma,1st_assignment,score1,2nd_assignment,"
          "score2,confidence\n")


@pytest.fixture()
def csv_path(tmp_path):
    rows = [
        # name, gamma, target, confidence
        ("r0", 0.9, "T1", 1.0),
        ("r1", 0.8, "T1", 0.9),
        ("r2", 0.02, "T1", 0.9),   # low gamma
        ("r3", 0.7, "T2", 0.6),    # low confidence
        ("r4", 0.7, "T2", 0.8),
        ("r5", 0, "NA", 0),
    ]
    p = tmp_path / "res.csv"
    p.write_text(HEADER + "".join(
        f"{n},100,{g},{t},50,NA,0,{c}\n" for n, g, t, c in rows))
    return p


def _lines(capsys):
    return capsys.readouterr().out.strip().splitlines()


def test_abundance_plain(csv_path, capsys):
    assert main(["abundance", "-R", str(csv_path)]) == 0
    out = _lines(capsys)
    assert out[0] == "Name,Count,Proportion_All(%),Proportion_Classified(%)"
    d = {l.split(",")[0]: l.split(",")[1:] for l in out[1:]}
    assert d["T1"][0] == "3" and d["T2"][0] == "2" and d["NA"][0] == "1"
    # classified proportions over 5 assigned reads; NA shows '-'
    assert d["T1"][2] == "60.0000"
    assert d["NA"][2] == "-"


def test_abundance_min_confidence(csv_path, capsys):
    assert main(["abundance", "-R", str(csv_path),
                 "--min-confidence", "0.75"]) == 0
    d = {l.split(",")[0]: l.split(",")[1] for l in _lines(capsys)[1:]}
    # r3 (conf 0.6) becomes NA
    assert d["T2"] == "1" and d["NA"] == "2"


def test_abundance_highconfidence(csv_path, capsys):
    assert main(["abundance", "-R", str(csv_path), "--highconfidence"]) == 0
    d = {l.split(",")[0]: l.split(",")[1] for l in _lines(capsys)[1:]}
    # r2 fails gamma>=0.03, r3 fails conf>=0.75
    assert d["T1"] == "2" and d["T2"] == "1" and d["NA"] == "3"


def test_density_confidence(csv_path, capsys):
    assert main(["density", "-R", str(csv_path), "--bins", "5"]) == 0
    out = _lines(capsys)
    assert out[0] == "confidence_bin,count,fraction"
    counts = [int(l.split(",")[1]) for l in out[1:]]
    assert sum(counts) == 5  # NA row excluded
    assert len(counts) == 5


def test_density_gamma(csv_path, capsys):
    assert main(["density", "-R", str(csv_path), "--by", "gamma",
                 "--bins", "10"]) == 0
    out = _lines(capsys)
    assert out[0] == "gamma_bin,count,fraction"
    assert sum(int(l.split(",")[1]) for l in out[1:]) == 5


def test_density_not_a_csv(tmp_path, capsys):
    p = tmp_path / "x.csv"
    p.write_text("a,b\n1,2\n")
    assert main(["density", "-R", str(p)]) == 1


def test_abundance_native_python_parity(csv_path, capsys, monkeypatch):
    """The native csv_tally pass and the csv-module fallback print
    byte-identical abundance reports (filters included)."""
    from cuclark_tpu import native

    if not native.available():
        pytest.skip("no native module")
    for flags in ([], ["--highconfidence"], ["--min-confidence", "0.75"]):
        assert main(["abundance", "-R", str(csv_path)] + flags) == 0
        nat = capsys.readouterr().out
        monkeypatch.setattr(native, "available", lambda: False)
        assert main(["abundance", "-R", str(csv_path)] + flags) == 0
        monkeypatch.undo()
        assert capsys.readouterr().out == nat


def test_density_native_python_parity(csv_path, capsys, monkeypatch):
    from cuclark_tpu import native

    if not native.available():
        pytest.skip("no native module")
    for by in ("confidence", "gamma"):
        assert main(["density", "-R", str(csv_path), "--by", by,
                     "--bins", "7"]) == 0
        nat = capsys.readouterr().out
        monkeypatch.setattr(native, "available", lambda: False)
        assert main(["density", "-R", str(csv_path), "--by", by,
                     "--bins", "7"]) == 0
        monkeypatch.undo()
        assert capsys.readouterr().out == nat


@pytest.fixture(params=["native", "fallback"])
def maybe_native(request, monkeypatch):
    """Run a test under both the native and csv-module paths."""
    from cuclark_tpu import native

    if request.param == "native":
        if not native.available():
            pytest.skip("no native module")
    else:
        monkeypatch.setattr(native, "available", lambda: False)
    return request.param


def test_abundance_malformed_row_rejected(tmp_path, capsys, maybe_native):
    """A mid-file row with the wrong field count is an error, not a
    silent miscount — on the native AND fallback paths."""
    p = tmp_path / "bad.csv"
    p.write_text(HEADER + "r0,100,0.9,T1,50,NA,0,1.0\n"
                 + "r1,100,garbage\n"
                 + "r2,100,0.9,T1,50,NA,0,1.0\n")
    assert main(["abundance", "-R", str(p)]) == 1
    assert "malformed" in capsys.readouterr().err


def test_abundance_garbage_filter_field_rejected(tmp_path, capsys,
                                                 maybe_native):
    """An unparseable confidence field under --highconfidence errors on
    both paths (the native parser must not silently read garbage as
    0.0 and tally the read as NA)."""
    p = tmp_path / "g.csv"
    p.write_text(HEADER + "r0,100,0.9,T1,50,NA,0,garbage\n")
    assert main(["abundance", "-R", str(p), "--highconfidence"]) == 1
    err = capsys.readouterr().err
    assert "malformed" in err or "could not convert" in err


def test_density_malformed_row_rejected(tmp_path, capsys, maybe_native):
    p = tmp_path / "bad.csv"
    p.write_text(HEADER + "r0,100,0.9,T1,50,NA,0,1.0\n"
                 + "r1,100\n"
                 + "r2,100,0.9,T1,50,NA,0,1.0\n")
    assert main(["density", "-R", str(p)]) == 1
    assert "malformed" in capsys.readouterr().err


def test_abundance_truncated_tail_tolerated(tmp_path, capsys,
                                            maybe_native):
    """A crash-truncated final line (incomplete fields, no newline) is
    ignored rather than treated as an error or a row."""
    p = tmp_path / "t.csv"
    p.write_text(HEADER + "r0,100,0.9,T1,50,NA,0,1.0\n" + "r1,100,0.")
    assert main(["abundance", "-R", str(p)]) == 0
    d = {l.split(",")[0]: l.split(",")[1]
         for l in _lines(capsys)[1:]}
    assert d == {"T1": "1"}


def test_abundance_complete_final_malformed_rejected(tmp_path, capsys,
                                                     maybe_native):
    """A newline-TERMINATED final row with the wrong field count was
    fully written (not crash-truncated) — real corruption, rejected on
    both paths."""
    p = tmp_path / "c.csv"
    p.write_text(HEADER + "r0,100,0.9,T1,50,NA,0,1.0\n" + "r1,100\n")
    assert main(["abundance", "-R", str(p)]) == 1
    assert "malformed" in capsys.readouterr().err


def test_abundance_crlf(tmp_path, capsys, maybe_native):
    """CRLF result CSVs parse identically on both paths (the '\\r' is
    not part of the confidence field)."""
    p = tmp_path / "crlf.csv"
    p.write_bytes(HEADER.replace("\n", "\r\n").encode()
                  + b"r0,100,0.9,T1,50,NA,0,1.0\r\n"
                  + b"r1,100,0.9,T2,50,NA,0,0.5\r\n")
    assert main(["abundance", "-R", str(p), "--highconfidence"]) == 0
    d = {l.split(",")[0]: l.split(",")[1]
         for l in _lines(capsys)[1:]}
    assert d == {"T1": "1", "NA": "1"}  # r1 filtered by conf 0.5


def test_abundance_tie_order_deterministic(tmp_path, capsys,
                                           maybe_native):
    """Count ties order by name on both paths (native interns NA
    first; the fallback inserts in row order — the sort must not leak
    that difference)."""
    p = tmp_path / "tie.csv"
    p.write_text(HEADER + "r0,100,0.9,T1,50,NA,0,1.0\n"
                 + "r1,100,0,NA,0,NA,0,0\n"
                 + "r2,100,0.9,A9,50,NA,0,1.0\n")
    assert main(["abundance", "-R", str(p)]) == 0
    names = [l.split(",")[0] for l in _lines(capsys)[1:]]
    assert names == ["A9", "NA", "T1"]  # all count 1: alphabetical


def test_abundance_fuzz_parity(tmp_path, capsys, monkeypatch):
    """Randomized CSVs (random names incl. empties and odd characters,
    random float formats, blank lines, CRLF, with/without trailing
    newline) print byte-identical reports on the native and fallback
    paths under every filter combination."""
    import random

    from cuclark_tpu import native

    if not native.available():
        pytest.skip("no native module")
    rng = random.Random(5)
    name_pool = (["NA"] + [f"T{i}" for i in range(6)]
                 + ["x y", "Acc_01.2", "zz-9", ""])
    for trial in range(8):
        rows = []
        for i in range(rng.randrange(1, 60)):
            t = rng.choice(name_pool)
            g = rng.choice(["0", "1", "0.5", "0.123456", "1e-05", "-0"])
            c = rng.choice(["0", "1", "0.75", "0.9999", "5e-01"])
            rows.append(f"r{i},100,{g},{t},50,NA,0,{c}")
            if rng.random() < 0.1:
                rows.append("")  # blank line
        eol = "\r\n" if trial % 3 == 0 else "\n"
        body = eol.join(rows)
        if trial % 2 == 0:
            body += eol  # with/without final newline
        p = tmp_path / f"f{trial}.csv"
        p.write_bytes(HEADER.replace("\n", eol).encode() + body.encode())
        for flags in ([], ["--highconfidence"],
                      ["--min-gamma", "0.1"]):
            rcs, outs = [], []
            for use_native in (True, False):
                if not use_native:
                    monkeypatch.setattr(native, "available",
                                        lambda: False)
                rcs.append(main(["abundance", "-R", str(p)] + flags))
                outs.append(capsys.readouterr().out)
                monkeypatch.undo()
            assert rcs[0] == rcs[1], (trial, flags, outs)
            assert outs[0] == outs[1], (trial, flags)


def test_abundance_db_dir_lists_unhit_targets(csv_path, tmp_path, capsys):
    """-D seeds the report with every DB target, zero counts included."""
    import numpy as np

    from cuclark_tpu.config import DBConfig
    from cuclark_tpu.hashdb import build_table

    km = np.arange(64, dtype=np.uint64) * np.uint64(7919)
    from cuclark_tpu import codec

    km = np.unique(codec.canonical_np(km, 27))
    labels = (np.arange(len(km)) % 3 + 1).astype(np.uint32)
    db = build_table(km, labels, ["NA", "T1", "T2", "T9"], DBConfig(k=27))
    dbdir = tmp_path / "db"
    dbdir.mkdir()
    db.save(dbdir / "db_k27.npz")

    assert main(["abundance", "-R", str(csv_path), "-D", str(dbdir)]) == 0
    d = {l.split(",")[0]: l.split(",")[1] for l in _lines(capsys)[1:]}
    assert d["T1"] == "3" and d["T2"] == "2"
    assert d["T9"] == "0"  # unhit DB target present with count 0
