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
