"""Offline database construction: target-specific canonical k-mers.

The TPU-framework equivalent of the reference DB-build path
(makeSpecificTargetSets, src/CuCLARK_hh.hh:690-1329 + EHashtable
RemoveCommon, src/HashTableStorage_hh.hh:242-292): stream every
reference genome, extract canonical k-mers, keep exactly those k-mers
that occur in a single target, and lay them out as the flat two-choice
hash table.

Instead of a 146 GB chained mother-table, discrimination is a
sort-reduce over (kmer, label) occurrence arrays — vectorized numpy
here, with the same algorithm designed to shard by hash prefix for
out-of-core scale (each hash-prefix shard reduces independently).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from cuclark_tpu import codec
from cuclark_tpu.config import DBConfig
from cuclark_tpu.hashdb import KmerDB, build_table
from cuclark_tpu.io import fasta


def extract_canonical_np(seq: bytes | np.ndarray, k: int) -> np.ndarray:
    """All overlapping canonical k-mers of one sequence (uint64),
    honoring part semantics (no k-mer spans a non-ACGT char) — the full
    mode build walk (src/CuCLARK_hh.hh:1100-1163)."""
    codes = codec.encode_ascii(seq).astype(np.int64)
    n = len(codes)
    if n < k:
        return np.empty(0, dtype=np.uint64)

    valid = codes < codec.INVALID
    # window is valid iff it contains no invalid char
    cs = np.concatenate([[0], np.cumsum(~valid)])
    wvalid = (cs[k:] - cs[:-k]) == 0           # [n-k+1]

    vals = np.where(valid, codes, 0).astype(np.uint64)
    km = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        km = (km << np.uint64(2)) | vals[j: j + n - k + 1]
    km = km[wvalid]
    return codec.canonical_np(km, k)


def extract_canonical_light_np(seq: bytes | np.ndarray, k: int, gap: int,
                               iter0: int = 0):
    """Light-mode build walk: NON-overlapping k-mer blocks (the rolling
    k-mer resets after each complete k-mer, src/CuCLARK_hh.hh:725-731),
    keeping every gap-th block.  The block counter `iter` persists
    across parts and sequences of one genome file (it is only reset per
    file in the reference).  Returns (kmers, iter)."""
    codes = codec.encode_ascii(seq).astype(np.int64)
    valid = codes < codec.INVALID
    out = []
    it = iter0
    # part boundaries: runs of valid codes
    n = len(codes)
    i = 0
    starts = np.flatnonzero(np.diff(np.r_[0, valid.view(np.int8)]) == 1)
    ends = np.flatnonzero(np.diff(np.r_[valid.view(np.int8), 0]) == -1) + 1
    for s, e in zip(starts, ends):
        nblocks = (e - s) // k
        if nblocks == 0:
            continue
        offs = s + np.arange(nblocks) * k
        km = np.zeros(nblocks, dtype=np.uint64)
        for j in range(k):
            km = (km << np.uint64(2)) | codes[offs + j].astype(np.uint64)
        sel = ((it + np.arange(nblocks)) % gap) == 0
        out.append(km[sel])
        it += nblocks
    if not out:
        return np.empty(0, np.uint64), it
    return codec.canonical_np(np.concatenate(out), k), it


def parse_targets_file(path) -> list[tuple[str, str]]:
    """targets.txt lines: '<seqfile> <label> [label2]'
    (reference getTargetsData, src/CuCLARK_hh.hh:1794-1906).
    Returns [(file, label)] keeping only the first label column."""
    out = []
    base = Path(path).parent
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        if len(parts) < 2:
            raise ValueError(f"targets line needs '<file> <label>': {line!r}")
        fp = parts[0]
        if not Path(fp).exists() and (base / fp).exists():
            fp = str(base / fp)
        out.append((fp, parts[1]))
    return out


def collect_target_kmers(file_labels, cfg: DBConfig, progress=None):
    """Stream genomes; return (kmers u64[N], labels u32[N], target_names).

    target_names[0] == 'NA'; label ids are first-seen order, 1-based
    (matching the reference's first-seen target registration)."""
    from cuclark_tpu import native

    names = ["NA"]
    ids: dict[str, int] = {}
    km_chunks = []
    lb_chunks = []
    use_native = native.available()
    for fp, label in file_labels:
        if label not in ids:
            ids[label] = len(names)
            names.append(label)
        lid = ids[label]
        it = 0  # light-mode block counter, reset per genome file
        for _name, seq in fasta.read_records(fp):
            if cfg.gap > 1:
                if use_native:
                    km, it = native.extract_canonical_light(seq, cfg.k,
                                                            cfg.gap, it)
                else:
                    km, it = extract_canonical_light_np(seq, cfg.k,
                                                        cfg.gap, it)
            elif use_native:
                km = native.extract_canonical(seq, cfg.k)
            else:
                km = extract_canonical_np(seq, cfg.k)
            if len(km):
                km_chunks.append(km)
                lb_chunks.append(np.full(len(km), lid, dtype=np.uint32))
        if progress:
            progress(fp, label)
    if not km_chunks:
        return (np.empty(0, np.uint64), np.empty(0, np.uint32), names)
    return np.concatenate(km_chunks), np.concatenate(lb_chunks), names


def discriminate(kmers: np.ndarray, labels: np.ndarray, min_count: int = 0):
    """Keep k-mers occurring in exactly one target (RemoveCommon
    semantics) with occurrence count >= min_count (reference -t).

    Returns (unique_kmers u64, labels u32, counts u32)."""
    if len(kmers) == 0:
        return kmers, labels, np.empty(0, np.uint32)
    order = np.argsort(kmers, kind="stable")
    sk = kmers[order]
    sl = labels[order]
    starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
    lmin = np.minimum.reduceat(sl, starts)
    lmax = np.maximum.reduceat(sl, starts)
    counts = np.diff(np.r_[starts, len(sk)]).astype(np.uint32)
    specific = lmin == lmax
    if min_count > 1:
        specific &= counts >= min_count
    return sk[starts[specific]], lmin[specific], counts[specific]


def build_db(file_labels, cfg: DBConfig, progress=None) -> KmerDB:
    kmers, labels, names = collect_target_kmers(file_labels, cfg, progress)
    kmers, labels, _counts = discriminate(kmers, labels, cfg.min_count)
    return build_table(kmers, labels, names, cfg)


def db_name(cfg: DBConfig, num_targets: int) -> str:
    """Database artifact name, mirroring the reference's encoding of its
    parameters into the filename (getdbName, src/CuCLARK_hh.hh:579-591)."""
    light = f"_g{cfg.gap}" if cfg.gap > 1 else ""
    return f"db_k{cfg.k}_t{num_targets}_s{cfg.slots}c{cfg.num_choices}_m{cfg.min_count}{light}.npz"
