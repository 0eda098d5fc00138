"""Golden example fixture: committed inputs must reproduce the
committed expected CSV bit-for-bit (the reference's example.sh
verification contract, data/README.md:16-21)."""

from pathlib import Path

from cuclark_tpu.cli import main

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def test_example_reproduces_expected_csv(tmp_path):
    rc = main(["build-db", "-T", str(EXAMPLES / "targets.txt"),
               "-D", str(tmp_path / "db"), "-k", "27"])
    assert rc == 0
    out = tmp_path / "results.csv"
    rc = main(["classify", "-D", str(tmp_path / "db"),
               "-O", str(EXAMPLES / "reads.fq"), "-R", str(out)])
    assert rc == 0
    assert out.read_bytes() == (EXAMPLES / "expected_results.csv").read_bytes()
