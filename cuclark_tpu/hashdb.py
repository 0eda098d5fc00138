"""TPU-native k-mer database: flat two-choice bucketed hash table.

Replaces the reference's chained host hash table + CSR GPU layout
(src/hashTable_hh.hh bucket chains; src/CuClarkDB.cu:582-648 prefix-sum
bucket pointers; src/CuClarkDB.cu:1249-1314 quotient linear scan) with a
layout designed for TPU HBM gathers:

  table: uint32[NB, 3*S]   rows = [klo x S | khi x S | label x S]

One probe = gather one contiguous, aligned row per hash choice and a
vectorized compare across the S slots — no pointer chasing, no
variable-length bucket scans, no per-part window bookkeeping.  NB is a
power of two so bucketing is a mask, not the reference's 64-bit
divmod-by-HTSIZE (src/CuClarkDB.cu:1264-1265).

Two-choice (bucketed-cuckoo) insertion keeps the table overflow-free at
high load factors; the build is offline so eviction cost is irrelevant.
Because the DB stores only *target-specific* canonical k-mers
(multiplicity filter, reference RemoveCommon
src/HashTableStorage_hh.hh:242-292), every key is unique and a probe
matches in at most one slot of one choice.

Stored labels are 1-based (0 = "NA" / miss), matching the reference's
result indexing (src/CuClarkDB.cu:1449 stores index+1).
"""

from __future__ import annotations

import dataclasses
import json
import zlib
from pathlib import Path

import numpy as np

from cuclark_tpu.config import DBConfig, MTRGTS

# Empty-slot sentinel. An all-ones uint64 can never be a canonical
# k-mer: its reverse complement is 0, which is always smaller.
EMPTY = np.uint32(0xFFFFFFFF)

_M32 = np.uint32


def _fmix(h):
    """murmur3 fmix32 finalizer (public-domain constant mix)."""
    h = h ^ (h >> _M32(16))
    h = h * _M32(0x85EBCA6B)
    h = h ^ (h >> _M32(13))
    h = h * _M32(0xC2B2AE35)
    h = h ^ (h >> _M32(16))
    return h


def mix1(hi, lo):
    """First bucket hash of a (hi, lo) uint32 k-mer pair -> uint32."""
    return _fmix(lo ^ (hi * _M32(0x9E3779B9)))


def mix2(hi, lo):
    """Second, independent bucket hash."""
    return _fmix(hi ^ (lo * _M32(0x85EBCA6B)) ^ _M32(0x5BD1E995))


def _split64(kmers: np.ndarray):
    kmers = np.asarray(kmers, dtype=np.uint64)
    hi = (kmers >> np.uint64(32)).astype(np.uint32)
    lo = (kmers & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return hi, lo


@dataclasses.dataclass
class KmerDB:
    """An immutable, device-loadable k-mer database."""

    k: int
    slots: int
    num_choices: int
    nb_bits: int                 # NB = 1 << nb_bits buckets
    target_names: list[str]      # index 0 == "NA", 1..T real targets
    table: np.ndarray            # uint32 [NB, 3*slots]
    num_kmers: int
    gap: int = 1                 # build-time k-mer stride used

    @property
    def nb(self) -> int:
        return 1 << self.nb_bits

    @property
    def num_targets(self) -> int:
        return len(self.target_names) - 1

    # ---------- persistence ----------

    def save(self, path: str | Path) -> None:
        meta = {
            "format": "cuclark-tpu-db-v1",
            "k": self.k,
            "slots": self.slots,
            "num_choices": self.num_choices,
            "nb_bits": self.nb_bits,
            "num_kmers": self.num_kmers,
            "gap": self.gap,
            "target_names": self.target_names,
        }
        np.savez_compressed(
            path,
            table=self.table,
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        )

    @classmethod
    def load(cls, path: str | Path, sample_factor: int = 1) -> "KmerDB":
        """Load a DB; sample_factor s keeps every s-th bucket only
        (query-time subsampling, the analog of the reference -s flag,
        src/CuClarkDB.cu:508-524)."""
        with np.load(path) as z:
            meta = json.loads(bytes(z["meta"]).decode())
            table = z["table"]
        if meta.get("format") != "cuclark-tpu-db-v1":
            raise ValueError(f"not a cuclark-tpu database: {path}")
        db = cls(
            k=meta["k"],
            slots=meta["slots"],
            num_choices=meta["num_choices"],
            nb_bits=meta["nb_bits"],
            target_names=list(meta["target_names"]),
            table=table,
            num_kmers=meta["num_kmers"],
            gap=meta.get("gap", 1),
        )
        if sample_factor > 1:
            keep = (np.arange(db.nb) % sample_factor) == 0
            table = db.table.copy()
            table[~keep] = EMPTY
            db.table = table
        return db

    def checksum(self) -> int:
        return zlib.crc32(self.table.tobytes())

    # ---------- host-side probe / self-check ----------

    def probe_np(self, kmers: np.ndarray) -> np.ndarray:
        """Pure-numpy probe (debug/verification twin of probe.probe)."""
        hi, lo = _split64(np.asarray(kmers, dtype=np.uint64))
        mask = _M32(self.nb - 1)
        S = self.slots
        label = np.zeros(len(hi), dtype=np.int32)
        with np.errstate(over="ignore"):
            b1 = mix1(hi, lo) & mask
            for choice in range(self.num_choices):
                b = b1 if choice == 0 else (mix2(hi, lo) & mask)
                rows = self.table[b.astype(np.int64)]
                m = (rows[:, :S] == lo[:, None]) & (rows[:, S:2 * S] == hi[:, None])
                if choice == 1:
                    m &= (b != b1)[:, None]
                label += np.where(m, rows[:, 2 * S:].astype(np.int32), 0).sum(axis=1)
        return label

    def verify(self, kmers: np.ndarray, labels: np.ndarray,
               sample: int | None = 100_000) -> None:
        """Build self-check: every stored k-mer must probe back to its
        label (the role of the reference's write-time asserts,
        src/hashTable_hh.hh:616-629).  Raises on mismatch."""
        n = len(kmers)
        if sample is not None and n > sample:
            idx = np.random.default_rng(0).choice(n, sample, replace=False)
            kmers, labels = kmers[idx], labels[idx]
        got = self.probe_np(kmers)
        bad = got != np.asarray(labels, dtype=np.int32)
        if bad.any():
            i = int(np.flatnonzero(bad)[0])
            raise AssertionError(
                f"DB self-check failed: kmer {kmers[i]:#x} -> {got[i]} "
                f"(want {labels[i]}); {int(bad.sum())}/{len(kmers)} bad")


def choose_nb_bits(n_kmers: int, cfg: DBConfig) -> int:
    """Smallest power-of-two bucket count achieving <= target_load."""
    need = max(1, int(np.ceil(n_kmers / (cfg.slots * cfg.target_load))))
    bits = max(4, int(np.ceil(np.log2(need))))
    return bits


def build_table(
    kmers: np.ndarray,
    labels: np.ndarray,
    target_names: list[str],
    cfg: DBConfig,
    nb_bits: int | None = None,
) -> KmerDB:
    """Assemble the hash table from unique canonical k-mers + labels.

    kmers:  uint64 [N] unique canonical k-mers.
    labels: int    [N] 1-based target labels (1..T).
    target_names: T+1 names, index 0 == "NA".
    """
    kmers = np.asarray(kmers, dtype=np.uint64)
    labels = np.asarray(labels, dtype=np.uint32)
    n = len(kmers)
    if len(labels) != n:
        raise ValueError("kmers and labels length mismatch")
    if labels.size and (labels.min() < 1 or labels.max() > MTRGTS):
        raise ValueError("labels must be 1-based and <= MTRGTS")
    if len(np.unique(kmers)) != n:
        raise ValueError("k-mers must be unique (target-specific)")

    if nb_bits is None:
        nb_bits = choose_nb_bits(n, cfg)

    for attempt in range(8):
        db = _try_build(kmers, labels, target_names, cfg, nb_bits)
        if db is not None:
            db.verify(kmers, labels)
            return db
        nb_bits += 1  # overflow: double the table and retry
    raise RuntimeError("hash table construction failed to converge")


def _try_build(kmers, labels, target_names, cfg, nb_bits):
    from cuclark_tpu import native

    if native.available():
        built = native.build_cuckoo(kmers, labels, nb_bits, cfg.slots,
                                    cfg.num_choices)
        if built is None:
            return None
        keys_lo, keys_hi, labs = built
        table = np.concatenate([keys_lo, keys_hi, labs], axis=1)
        return KmerDB(
            k=cfg.k, slots=cfg.slots, num_choices=cfg.num_choices,
            nb_bits=nb_bits, target_names=list(target_names),
            table=np.ascontiguousarray(table, np.uint32),
            num_kmers=len(kmers), gap=cfg.gap,
        )
    return _try_build_np(kmers, labels, target_names, cfg, nb_bits)


def _try_build_np(kmers, labels, target_names, cfg, nb_bits):
    S = cfg.slots
    nb = 1 << nb_bits
    mask = _M32(nb - 1)
    hi, lo = _split64(kmers)
    b1 = (mix1(hi, lo) & mask).astype(np.int64)
    b2 = (mix2(hi, lo) & mask).astype(np.int64) if cfg.num_choices == 2 else b1

    keys_lo = np.full((nb, S), EMPTY, dtype=np.uint32)
    keys_hi = np.full((nb, S), EMPTY, dtype=np.uint32)
    labs = np.zeros((nb, S), dtype=np.uint32)
    occ = np.zeros(nb, dtype=np.int32)

    def place_bulk(idx, buckets):
        """Vectorized greedy fill: for each item, take a free slot in its
        bucket if the bucket has room after accounting for earlier items
        in this pass.  Returns indices that did not fit."""
        nonlocal occ
        if len(idx) == 0:
            return idx
        order = np.argsort(buckets, kind="stable")
        sidx = idx[order]
        sbuck = buckets[order]
        # rank of each item within its bucket run
        first = np.r_[True, sbuck[1:] != sbuck[:-1]]
        run_id = np.cumsum(first) - 1
        run_start = np.flatnonzero(first)
        rank = np.arange(len(sbuck)) - run_start[run_id]
        slot = occ[sbuck] + rank
        fits = slot < S
        pb, ps, pi = sbuck[fits], slot[fits], sidx[fits]
        keys_lo[pb, ps] = lo[pi]
        keys_hi[pb, ps] = hi[pi]
        labs[pb, ps] = labels[pi]
        # update occupancy: occ[b] += count placed in b
        cnt = np.bincount(pb, minlength=nb)
        occ += cnt.astype(np.int32)
        return sidx[~fits]

    all_idx = np.arange(len(kmers))
    rest = place_bulk(all_idx, b1[all_idx])
    if cfg.num_choices == 2 and len(rest):
        rest = place_bulk(rest, b2[rest])

    if len(rest) and cfg.num_choices == 1:
        return None  # single-choice: overflow means the table is too small

    # Cuckoo random-walk eviction for the leftovers (rare at sane loads).
    rng = np.random.default_rng(0x5EED)
    max_steps = 200
    with np.errstate(over="ignore"):  # uint32 mix wraps by design
        for i in rest:
            cur = (np.uint64(kmers[i]), np.uint32(labels[i]))
            placed = False
            for step in range(max_steps):
                chi, clo = _split64(cur[0])
                cb = int((mix1(chi, clo) if (step % 2 == 0) else mix2(chi, clo)) & mask)
                if occ[cb] < S:
                    s = occ[cb]
                    keys_lo[cb, s] = clo
                    keys_hi[cb, s] = chi
                    labs[cb, s] = cur[1]
                    occ[cb] += 1
                    placed = True
                    break
                s = int(rng.integers(S))
                ev = (
                    (np.uint64(keys_hi[cb, s]) << np.uint64(32)) | np.uint64(keys_lo[cb, s]),
                    np.uint32(labs[cb, s]),
                )
                keys_lo[cb, s] = clo
                keys_hi[cb, s] = chi
                labs[cb, s] = cur[1]
                cur = ev
            if not placed:
                return None  # table effectively full: grow and retry

    table = np.concatenate([keys_lo, keys_hi, labs], axis=1).astype(np.uint32)
    return KmerDB(
        k=cfg.k,
        slots=S,
        num_choices=cfg.num_choices,
        nb_bits=nb_bits,
        target_names=list(target_names),
        table=table,
        num_kmers=len(kmers),
        gap=cfg.gap,
    )
