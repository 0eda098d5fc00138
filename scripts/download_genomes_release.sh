#!/usr/bin/env bash
# Download a full RefSeq RELEASE for a domain and split the multi-FASTA
# archives into one file per accession — the reference's
# download_data_release.sh variant (its per-accession split is what the
# targets-definition pipeline expects: one sequence file per target).
#
# Usage: download_genomes_release.sh <dest_dir> <domain>
#        (domain: bacteria, viral, fungi, archaea, ...)
set -euo pipefail

DEST="${1:?usage: download_genomes_release.sh <dest_dir> <domain>}"
DOMAIN="${2:?usage: download_genomes_release.sh <dest_dir> <domain>}"
mkdir -p "$DEST"
cd "$DEST"

BASE="https://ftp.ncbi.nlm.nih.gov/refseq/release/${DOMAIN}"
echo "Listing $BASE ..."
curl -fsSL "$BASE/" \
    | grep -oE "${DOMAIN}\.[0-9]+\.[0-9]+\.genomic\.fna\.gz" \
    | sort -u > archives.txt
N=$(wc -l < archives.txt)
echo "$N release archives; downloading + splitting per accession..."

mkdir -p split
while read -r f; do
    [ -e "$f" ] || curl -fsSLO "$BASE/$f" || { echo "WARN: failed $f" >&2; continue; }
    # split: each '>' header starts a new per-accession file named by
    # the first header token (accession.version)
    gzip -dc "$f" | awk '
        /^>/ { acc = substr($1, 2); gsub(/[^A-Za-z0-9._-]/, "_", acc);
               out = "split/" acc ".fna" }
        out != "" { print > out }'
done < archives.txt

echo "Per-accession files in $DEST/split:"
ls split | wc -l
