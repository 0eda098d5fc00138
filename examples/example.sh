#!/usr/bin/env bash
# Golden-output verification, the analog of the reference's example.sh
# (data/README.md:16-21: "Run the included example.sh to verify the
# output of your CuCLARK installation").
#
# Builds a database from the three example genomes, classifies the
# example reads, and diffs against the committed expected CSV.
set -euo pipefail
cd "$(dirname "$0")"

CLI="${CUCLARK_TPU:-cuclark-tpu}"
command -v "$CLI" >/dev/null 2>&1 || CLI="python -m cuclark_tpu.cli"

rm -rf db_example results.csv
$CLI build-db -T targets.txt -D db_example -k 27
$CLI classify -D db_example -O reads.fq -R results.csv

if cmp -s results.csv expected_results.csv; then
    echo "OK: results are bit-identical to expected_results.csv"
else
    echo "FAIL: results differ from expected_results.csv" >&2
    diff results.csv expected_results.csv | head >&2
    exit 1
fi

# Accuracy loop (the reference bundles "HiSeq_accuracy.fa"-style sets;
# here the reads are simulated with 1% errors and scored against the
# truth embedded in their names).
$CLI simulate-reads -T targets.txt -O sim.fq -n 2000 -l 100 --sub-rate 0.01
$CLI classify -D db_example -O sim.fq -R sim.csv
$CLI evaluate -R sim.csv --min-recall 0.95 --min-precision 0.98
echo "OK: accuracy floors hold (recall >= 0.95, precision >= 0.98)"

# Abundance summary over the golden results
$CLI abundance -R results.csv -D db_example >/dev/null
echo "OK: abundance summary runs"
rm -rf db_example sim.fq sim.csv results.csv
