"""CLI surface tests (build-db, classify, tsk resume, spectrum, clean)."""

import random

import numpy as np
import pytest

from cuclark_tpu.cli import main
from cuclark_tpu.db_build.builder import is_spectrum_file, read_spectrum
from tests import oracle


@pytest.fixture(scope="module")
def demo(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = random.Random(31)
    genomes = {}
    lines = []
    for t in (1, 2):
        g = "".join(rng.choice("ACGT") for _ in range(2000))
        genomes[t] = g
        p = tmp / f"g{t}.fa"
        p.write_text(f">g{t}\n{g}\n")
        lines.append(f"{p} S{t}")
    (tmp / "targets.txt").write_text("\n".join(lines) + "\n")
    reads = []
    for i in range(30):
        t = rng.randrange(1, 3)
        pos = rng.randrange(0, 1900)
        reads.append((f"r{i}_t{t}", genomes[t][pos: pos + 100]))
    (tmp / "reads.fq").write_text("".join(
        f"@{n}\n{s}\n+\n{'I' * len(s)}\n" for n, s in reads))
    return tmp, genomes, reads


def test_build_classify_roundtrip(demo, capsys):
    tmp, genomes, reads = demo
    rc = main(["build-db", "-T", str(tmp / "targets.txt"),
               "-D", str(tmp / "db"), "-k", "21", "--tsk"])
    assert rc == 0
    assert (tmp / "db" / "tsk" / "tsk.npz").exists()
    rc = main(["classify", "-D", str(tmp / "db"),
               "-O", str(tmp / "reads.fq"), "-R", str(tmp / "out.csv")])
    assert rc == 0
    rows = (tmp / "out.csv").read_text().splitlines()
    assert len(rows) == 31
    for line in rows[1:]:
        name, _, _, assign = line.split(",")[:4]
        want = "S" + name.split("_t")[1]
        assert assign == want


def test_tsk_resume_rebuild(demo):
    tmp, _, _ = demo
    # remove the db artifact; rebuild must come from the tsk archive
    for p in (tmp / "db").glob("db_k*.npz"):
        p.unlink()
    rc = main(["build-db", "-T", str(tmp / "targets.txt"),
               "-D", str(tmp / "db"), "-k", "21", "--tsk", "--slots", "2",
               "--load", "0.5"])
    assert rc == 0
    assert list((tmp / "db").glob("db_k*.npz"))


def test_spectrum_input(tmp_path):
    k = 9
    rng = random.Random(5)
    # two targets as spectrum files with explicit counts
    spec = {}
    for t in (1, 2):
        kms = {}
        for _ in range(60):
            s = "".join(rng.choice("ACGT") for _ in range(k))
            kms[s] = rng.randrange(1, 5)
        spec[t] = kms
        (tmp_path / f"t{t}.spectrum").write_text(
            "".join(f"{s} {c}\n" for s, c in kms.items()))
    (tmp_path / "targets.txt").write_text(
        f"{tmp_path}/t1.spectrum A\n{tmp_path}/t2.spectrum B\n")

    assert is_spectrum_file(tmp_path / "t1.spectrum")
    km, ct = read_spectrum(tmp_path / "t1.spectrum", k)
    assert len(km) == len(spec[1])

    rc = main(["build-db", "-T", str(tmp_path / "targets.txt"),
               "-D", str(tmp_path / "db"), "-k", str(k)])
    assert rc == 0
    # oracle check of DB content
    from cuclark_tpu.hashdb import KmerDB
    db = KmerDB.load(next((tmp_path / "db").glob("db_k*.npz")))
    want = {}
    for t, kms in spec.items():
        for s in kms:
            cv = oracle.canonical_value(oracle.kmer_value(s), k)
            if cv in want and want[cv] != t:
                want[cv] = -1
            elif cv not in want:
                want[cv] = t
    n_specific = sum(1 for v in want.values() if v > 0)
    assert db.num_kmers == n_specific


def test_spectrum_min_count(tmp_path):
    k = 7
    (tmp_path / "a.spectrum").write_text("ACGTACG 5\nGGGTTTA 1\n")
    (tmp_path / "targets.txt").write_text(f"{tmp_path}/a.spectrum X\n")
    rc = main(["build-db", "-T", str(tmp_path / "targets.txt"),
               "-D", str(tmp_path / "db"), "-k", str(k), "-t", "3"])
    assert rc == 0
    from cuclark_tpu.hashdb import KmerDB
    db = KmerDB.load(next((tmp_path / "db").glob("db_k*.npz")))
    assert db.num_kmers == 1  # only the count-5 k-mer survives -t 3


def test_clean(demo):
    tmp, _, _ = demo
    assert list((tmp / "db").glob("db_k*.npz"))
    rc = main(["clean", "-D", str(tmp / "db")])
    assert rc == 0
    assert not list((tmp / "db").glob("db_k*.npz"))
    assert (tmp / "db" / "tsk" / "tsk.npz").exists()
    rc = main(["clean", "-D", str(tmp / "db"), "--all"])
    assert rc == 0
    assert not (tmp / "db" / "tsk").exists()


def test_version_like_flags(capsys):
    with pytest.raises(SystemExit):
        main(["--help"])


def test_resume_appends(demo, tmp_path):
    tmp, genomes, reads = demo
    # rebuild DB (cleaned by test_clean) then classify fully
    main(["build-db", "-T", str(tmp / "targets.txt"),
          "-D", str(tmp / "db2"), "-k", "21"])
    full = tmp_path / "full.csv"
    main(["classify", "-D", str(tmp / "db2"),
          "-O", str(tmp / "reads.fq"), "-R", str(full)])
    want = full.read_text()
    # simulate a crash after 12 reads, then resume
    part = tmp_path / "part.csv"
    part.write_text("".join(want.splitlines(keepends=True)[:13]))
    rc = main(["classify", "-D", str(tmp / "db2"),
               "-O", str(tmp / "reads.fq"), "-R", str(part), "--resume"])
    assert rc == 0
    assert part.read_text() == want


def test_resume_truncated_mid_row(demo, tmp_path):
    """A crash mid-row leaves a final line without '\\n'; --resume must
    re-emit that read (not skip it), yielding a file byte-identical to
    an uninterrupted run (VERDICT r04 weak #5)."""
    tmp, genomes, reads = demo
    full = tmp_path / "full.csv"
    main(["classify", "-D", str(tmp / "db2"),
          "-O", str(tmp / "reads.fq"), "-R", str(full)])
    want = full.read_bytes()
    lines = want.splitlines(keepends=True)
    # crash scenarios: half a data row, exactly-a-row-no-newline, and a
    # partial header with no newline at all
    for cut in (b"".join(lines[:13]) + lines[13][: len(lines[13]) // 2],
                b"".join(lines[:13]) + lines[13].rstrip(b"\n"),
                lines[0][:5]):
        part = tmp_path / "part.csv"
        part.write_bytes(cut)
        rc = main(["classify", "-D", str(tmp / "db2"),
                   "-O", str(tmp / "reads.fq"), "-R", str(part),
                   "--resume"])
        assert rc == 0
        assert part.read_bytes() == want


def test_sfactor_range_rejected(demo, capsys):
    tmp, _, _ = demo
    rc = main(["classify", "-D", str(tmp / "db"),
               "-O", str(tmp / "reads.fq"), "-R", str(tmp / "sf.csv"),
               "-s", "31"])
    assert rc == 1
    assert "[2,30]" in capsys.readouterr().err


def test_no_widen_stash_flag():
    """--no-widen-stash flows into DBConfig.widen_for_warm_stash."""
    import argparse

    from cuclark_tpu.cli import _build_cfg

    base = dict(k=31, gap=1, min_freq_target=0, slots=2, choices=2,
                load=0.7, layout="qs", light=False)
    on = _build_cfg(argparse.Namespace(**base, no_widen_stash=False))
    off = _build_cfg(argparse.Namespace(**base, no_widen_stash=True))
    assert on.widen_for_warm_stash and not off.widen_for_warm_stash


def test_classify_requires_output_flag(tmp_path):
    """Missing -R (or -O) yields a usage error message, not a
    traceback."""
    from cuclark_tpu.cli import main

    (tmp_path / "g.fa").write_text(">g\nACGTACGTACGTACGTACGTACGTACGT\n")
    (tmp_path / "targets.txt").write_text(f"{tmp_path}/g.fa T1\n")
    main(["build-db", "-T", str(tmp_path / "targets.txt"),
          "-D", str(tmp_path / "db"), "-k", "21"])
    r1 = tmp_path / "r.fq"
    r1.write_text("@a\nACGTACGTACGTACGTACGTACGT\n+\n" + "I" * 24 + "\n")
    assert main(["classify", "-D", str(tmp_path / "db"),
                 "-O", str(r1)]) == 1          # no -R
    assert main(["classify", "-D", str(tmp_path / "db"),
                 "-R", str(tmp_path / "o.csv")]) == 1  # no -O/-P
    assert main(["classify", "-D", str(tmp_path / "db"),
                 "-P", str(r1), str(r1)]) == 1  # paired, no -R


def test_abundance_empty_csv_with_db(tmp_path, capsys):
    """abundance -D on a header-only CSV reports zero counts instead of
    ZeroDivisionError."""
    from cuclark_tpu.cli import main

    (tmp_path / "g.fa").write_text(">g\nACGTACGTACGTACGTACGTACGTACGT\n")
    (tmp_path / "targets.txt").write_text(f"{tmp_path}/g.fa T1\n")
    main(["build-db", "-T", str(tmp_path / "targets.txt"),
          "-D", str(tmp_path / "db"), "-k", "21"])
    csvp = tmp_path / "empty.csv"
    csvp.write_text("Object_ID,Length,Gamma,1st_assignment,score1,"
                    "2nd_assignment,score2,confidence\n")
    assert main(["abundance", "-R", str(csvp),
                 "-D", str(tmp_path / "db")]) == 0
    out = capsys.readouterr().out
    assert "T1,0,0.0000" in out
