"""Classification-accuracy harness (the one non-parity correctness
check): wgsim-style simulated reads with substitution/indel errors must
come back assigned to their source genomes with high precision/recall
(reference QA inputs: data/README.md:1-21, HiSeq/MiSeq accuracy sets,
wgsim-simulated reads)."""

import random

import numpy as np
import pytest

from cuclark_tpu import simulate
from cuclark_tpu.cli import main


def _random_genomes(n, length, seed=11):
    rng = random.Random(seed)
    return {f"G{t}": "".join(rng.choice("ACGT") for _ in range(length))
            for t in range(1, n + 1)}


def test_mutate_substitution_rate():
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 4, size=(200, 112)).astype(np.uint8)
    out = simulate.mutate_codes(rows, 100, rng, sub_rate=0.05,
                                ins_rate=0.0, del_rate=0.0)
    assert out.shape == (200, 100)
    frac = (out != rows[:, :100]).mean()
    # every substitution changes the base, so the observed hamming
    # fraction estimates the rate directly
    assert 0.03 < frac < 0.07


def test_mutate_deletion_shifts_left():
    rng = np.random.default_rng(1)
    rows = np.arange(20, dtype=np.uint8).reshape(1, 20) % 4
    out = simulate.mutate_codes(rows, 16, rng, sub_rate=0.0,
                                ins_rate=0.0, del_rate=0.5)
    # high del rate on a 16-base read: at least one deletion happened,
    # so the tail pulls pad bases in and the row is a subsequence of
    # the original window
    orig = (np.arange(20) % 4).tolist()
    o = out[0].tolist()
    it = iter(orig)
    assert all(any(b == x for x in it) for b in o)  # subsequence check


_RC = str.maketrans("ACGT", "TGCA")


def _rc(s: str) -> str:
    return s.translate(_RC)[::-1]


def test_simulate_reads_truth_names():
    genomes = _random_genomes(3, 3000)
    names, seqs = simulate.simulate_reads(genomes, 50, 80, seed=3)
    assert len(names) == len(seqs) == 50
    assert all(simulate.truth_of_name(n) in genomes for n in names)
    assert all(len(s) == 80 for s in seqs)
    # zero error rate reproduces exact substrings of either strand,
    # and BOTH strands appear (wgsim samples both; forward-only
    # sampling would blind the harness to RC canonicalization bugs)
    names0, seqs0 = simulate.simulate_reads(genomes, 40, 60, 0.0, 0.0,
                                            0.0, seed=4)
    fwd = rev = 0
    for n, s in zip(names0, seqs0):
        g = genomes[simulate.truth_of_name(n)]
        assert s in g or _rc(s) in g
        fwd += s in g
        rev += _rc(s) in g
    assert fwd > 5 and rev > 5


def test_multi_record_no_chimeras(tmp_path):
    """Windows never span record boundaries."""
    genomes = {"A": ["AC" * 200, "GT" * 200]}
    names, seqs = simulate.simulate_reads(genomes, 40, 50, 0.0, 0.0,
                                          0.0, seed=5)
    recs = ["AC" * 200, "GT" * 200]
    for s in seqs:
        assert any(s in r or _rc(s) in r for r in recs)


def test_paired_mates_share_one_insert():
    """FR orientation: mate 1 and RC(mate 2) are substrings of ONE
    genome window at most insert_len apart (regression: mates were
    once sampled from independent positions)."""
    genomes = _random_genomes(1, 5000, seed=8)
    g = genomes["G1"]
    names, s1, s2 = simulate.simulate_reads(
        genomes, 30, 40, 0.0, 0.0, 0.0, seed=6, paired=True,
        insert_len=120)
    for a, b in zip(s1, s2):
        fa = a if a in g else _rc(a)
        fb = _rc(b) if _rc(b) in g else b
        pa, pb = g.find(fa), g.find(fb)
        assert pa >= 0 and pb >= 0
        # one mate reads each end of the same <=132-base window
        assert abs(pa - pb) <= 132 - 40


@pytest.fixture(scope="module")
def acc_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("acc")
    genomes = _random_genomes(4, 20000)
    lines = []
    for t, g in genomes.items():
        p = tmp / f"{t}.fa"
        p.write_text(f">{t}\n{g}\n")
        lines.append(f"{p} {t}")
    (tmp / "targets.txt").write_text("\n".join(lines) + "\n")
    rc = main(["build-db", "-T", str(tmp / "targets.txt"),
               "-D", str(tmp / "db"), "-k", "27"])
    assert rc == 0
    return tmp, genomes


def test_accuracy_floors_1pct(acc_setup):
    """1% substitutions + 0.2% indels: recall >= 0.97, precision >=
    0.99 on orthogonal random genomes (a symmetric canonicalization or
    discrimination bug would crater these, while parity tests would
    still pass)."""
    tmp, genomes = acc_setup
    rc = main(["simulate-reads", "-T", str(tmp / "targets.txt"),
               "-O", str(tmp / "sim.fq"), "-n", "3000", "-l", "100",
               "--sub-rate", "0.01", "--ins-rate", "0.001",
               "--del-rate", "0.001", "--seed", "42"])
    assert rc == 0
    rc = main(["classify", "-D", str(tmp / "db"),
               "-O", str(tmp / "sim.fq"), "-R", str(tmp / "sim.csv")])
    assert rc == 0
    res = simulate.evaluate_assignments(tmp / "sim.csv")
    o = res["overall"]
    assert o["reads"] == 3000
    assert o["recall"] >= 0.97, res
    assert o["precision"] >= 0.99, res
    assert o["unclassified"] <= 0.03, res
    for t, d in res["per_target"].items():
        assert d["recall"] >= 0.95, (t, d)


def test_accuracy_floors_2pct_and_cli(acc_setup, capsys):
    """2% substitutions still classify nearly all reads; the evaluate
    CLI enforces floors."""
    tmp, genomes = acc_setup
    main(["simulate-reads", "-T", str(tmp / "targets.txt"),
          "-O", str(tmp / "sim2.fq"), "-n", "2000", "-l", "100",
          "--sub-rate", "0.02", "--seed", "7"])
    main(["classify", "-D", str(tmp / "db"),
          "-O", str(tmp / "sim2.fq"), "-R", str(tmp / "sim2.csv")])
    capsys.readouterr()  # drain classify's progress output
    assert main(["evaluate", "-R", str(tmp / "sim2.csv"),
                 "--min-recall", "0.93", "--min-precision", "0.99"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0] == "Target,Reads,Assigned,Recall,Precision,Unclassified"
    assert any(line.startswith("OVERALL,2000,") for line in out)
    # an impossible floor fails loudly
    assert main(["evaluate", "-R", str(tmp / "sim2.csv"),
                 "--min-recall", "1.01"]) == 1


def test_shared_region_reads_unclassified(tmp_path):
    """Discrimination accuracy: two targets share a spliced region;
    reads wholly inside it have NO target-specific k-mers and must be
    NA, while unique-region reads assign correctly (RemoveCommon
    semantics measured end to end, not just via parity)."""
    rng = random.Random(23)
    shared = "".join(rng.choice("ACGT") for _ in range(4000))
    uniq = {t: "".join(rng.choice("ACGT") for _ in range(8000))
            for t in ("A", "B")}
    lines = []
    for t, u in uniq.items():
        p = tmp_path / f"{t}.fa"
        p.write_text(f">{t}\n{shared + u}\n")
        lines.append(f"{p} {t}")
    (tmp_path / "targets.txt").write_text("\n".join(lines) + "\n")
    assert main(["build-db", "-T", str(tmp_path / "targets.txt"),
                 "-D", str(tmp_path / "db"), "-k", "27"]) == 0
    reads = []
    for i in range(200):  # wholly inside the shared prefix
        pos = rng.randrange(0, 4000 - 100)
        reads.append((f"s{i}|NA", shared[pos: pos + 100]))
    for i in range(200):  # wholly inside a unique suffix
        t = "A" if i % 2 else "B"
        pos = rng.randrange(0, 8000 - 100)
        reads.append((f"u{i}|{t}", uniq[t][pos: pos + 100]))
    (tmp_path / "r.fq").write_text("".join(
        f"@{n}\n{s}\n+\n{'I' * len(s)}\n" for n, s in reads))
    assert main(["classify", "-D", str(tmp_path / "db"),
                 "-O", str(tmp_path / "r.fq"),
                 "-R", str(tmp_path / "o.csv")]) == 0
    res = simulate.evaluate_assignments(tmp_path / "o.csv")
    # shared-region reads: all unclassified (their truth label "NA"
    # never appears as an assignment target)
    assert res["per_target"]["NA"]["unclassified"] == 1.0
    # unique-region reads: perfect assignment (no errors injected)
    assert res["per_target"]["A"]["recall"] == 1.0
    assert res["per_target"]["B"]["recall"] == 1.0
    assert res["per_target"]["A"]["precision"] == 1.0


def test_accuracy_paired(acc_setup):
    """Paired mates simulate from one insert and classify to the same
    truth target."""
    tmp, genomes = acc_setup
    rc = main(["simulate-reads", "-T", str(tmp / "targets.txt"),
               "-O", str(tmp / "p1.fq"),
               "--paired-output", str(tmp / "p2.fq"),
               "-n", "1000", "-l", "80", "--seed", "9"])
    assert rc == 0
    rc = main(["classify", "-D", str(tmp / "db"),
               "-P", str(tmp / "p1.fq"), str(tmp / "p2.fq"),
               "-R", str(tmp / "p.csv")])
    assert rc == 0
    res = simulate.evaluate_assignments(tmp / "p.csv")
    assert res["overall"]["recall"] >= 0.97, res
    assert res["overall"]["precision"] >= 0.99, res
