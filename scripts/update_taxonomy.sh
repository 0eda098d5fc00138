#!/usr/bin/env bash
# Refresh NCBI taxonomy data in place — the reference's updateTaxonomy.sh:
# re-downloads taxdump (nodes/names/merged) plus BOTH nucleotide
# accession2taxid tables (nucl_gb + nucl_wgs) into an existing taxonomy
# directory, replacing previous versions only after a successful fetch.
#
# Usage: update_taxonomy.sh <taxonomy_dir>
set -euo pipefail

DIR="${1:?usage: update_taxonomy.sh <taxonomy_dir>}"
[ -d "$DIR" ] || { echo "taxonomy dir $DIR does not exist (run download_taxonomy.sh first)" >&2; exit 1; }
cd "$DIR"

FTP="https://ftp.ncbi.nih.gov/pub/taxonomy"
TMP=$(mktemp -d -p .)
trap 'rm -rf "$TMP"' EXIT
cd "$TMP"

echo "Downloading latest taxdump..."
curl -fsSLO "$FTP/taxdump.tar.gz"
echo "Downloading accession2taxid (nucl_gb, nucl_wgs)..."
curl -fsSLO "$FTP/accession2taxid/nucl_gb.accession2taxid.gz"
curl -fsSLO "$FTP/accession2taxid/nucl_wgs.accession2taxid.gz"

# only replace once everything arrived intact (reference checks -s on
# each archive before uncompressing)
[ -s taxdump.tar.gz ] && [ -s nucl_gb.accession2taxid.gz ] \
    && [ -s nucl_wgs.accession2taxid.gz ]
tar -xzf taxdump.tar.gz nodes.dmp names.dmp merged.dmp
cd ..
mv -f "$TMP"/nodes.dmp "$TMP"/names.dmp "$TMP"/merged.dmp .
mv -f "$TMP"/nucl_gb.accession2taxid.gz "$TMP"/nucl_wgs.accession2taxid.gz .

echo "Taxonomy data updated in $DIR:"
ls -la
