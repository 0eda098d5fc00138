#!/usr/bin/env bash
# Download RefSeq complete genomes for a domain (bacteria/viral/fungi...),
# driven by assembly_summary.txt — the equivalent of the reference's
# download_data_newest.sh.
#
# Usage: download_genomes.sh <dest_dir> <domain>   (e.g. bacteria, viral)
#
# The reference's THIRD variant (legacy download_data.sh, pre-2014
# NCBI /genomes/Bacteria archive layout) is deliberately not ported:
# that FTP layout no longer exists, so a faithful port could never
# run; this script + download_genomes_release.sh cover its role.
set -euo pipefail

DEST="${1:?usage: download_genomes.sh <dest_dir> <domain>}"
DOMAIN="${2:?usage: download_genomes.sh <dest_dir> <domain>}"
mkdir -p "$DEST"
cd "$DEST"

SUMMARY="https://ftp.ncbi.nlm.nih.gov/genomes/refseq/${DOMAIN}/assembly_summary.txt"
echo "Fetching $SUMMARY ..."
curl -fsSLO "$SUMMARY"

# Complete genomes with latest version status; build per-assembly FTP paths.
awk -F'\t' '$12=="Complete Genome" && $11=="latest" {print $20}' \
    assembly_summary.txt > ftp_paths.txt
N=$(wc -l < ftp_paths.txt)
echo "$N complete genomes listed; downloading *_genomic.fna.gz ..."

i=0
while read -r url; do
    i=$((i + 1))
    base=$(basename "$url")
    f="${base}_genomic.fna.gz"
    [ -e "$f" ] && continue
    curl -fsSLO "${url}/${f}" || echo "WARN: failed $f" >&2
    printf '\r%d/%d' "$i" "$N" >&2
done < ftp_paths.txt
echo

echo "Done. Point 'cuclark-tpu set-targets <dbdir> $DEST --rank species' at this directory."
