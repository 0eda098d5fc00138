#!/usr/bin/env bash
# Download NCBI taxonomy data needed by `cuclark-tpu set-targets`.
# Equivalent of the reference's download_taxondata.sh / updateTaxonomy.sh:
# fetches taxdump (nodes.dmp, names.dmp, merged.dmp) and the nucleotide
# accession2taxid table into a taxonomy directory.
#
# Usage: download_taxonomy.sh <taxonomy_dir>
set -euo pipefail

DIR="${1:?usage: download_taxonomy.sh <taxonomy_dir>}"
mkdir -p "$DIR"
cd "$DIR"

FTP="https://ftp.ncbi.nih.gov/pub/taxonomy"

echo "Downloading taxdump..."
curl -fsSLO "$FTP/taxdump.tar.gz"
tar -xzf taxdump.tar.gz nodes.dmp names.dmp merged.dmp
rm -f taxdump.tar.gz

echo "Downloading accession2taxid (nucl_gb)..."
curl -fsSLO "$FTP/accession2taxid/nucl_gb.accession2taxid.gz"

echo "Taxonomy data ready in $DIR:"
ls -la "$DIR"
