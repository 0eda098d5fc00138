"""End-to-end classification pipeline.

The TPU analog of the reference orchestrator CuCLARK::runSimple +
getObjectsDataComputeFullGPU (src/CuCLARK_hh.hh:511-573, 1335-1788):
the host scans and packs reads into fixed-shape code batches; one
jitted device step does k-mer extraction -> canonicalization -> table
probe -> scoring; the host formats CLARK CSV rows.  The reference's
pinned-buffer batch machinery, CUDA events and OpenMP critical
sections disappear — XLA's async dispatch pipelines host packing and
CSV writing against device compute (dispatch batch i+1, then consume
batch i), and fixed (batch, length-bin) shapes keep everything
compile-once.

Two host paths:
 - classify_file: whole-file vectorized scan/pack (io.fast_parse), the
   fast path for real files;
 - classify_records: iterator of (name, seq) records, for streams and
   paired-end merging.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from cuclark_tpu import codec, score
from cuclark_tpu.config import ClassifyConfig
from cuclark_tpu.hashdb import KmerDB
from cuclark_tpu.probe import probe

# Length bins: a read is packed into the smallest bin holding it, so a
# batch of short reads never pays for a rare long read.
DEFAULT_LEN_BINS = (256, 1024, 4096, 16384)


@functools.partial(
    jax.jit, static_argnames=("k", "nb_bits", "slots", "num_choices", "with_labels")
)
def classify_step(table, codes, *, k, nb_bits, slots, num_choices,
                  with_labels=True):
    """One device step: codes [R, L] -> results [R, 5] (+ labels [R, P]).

    Single-chip version (sharded variant in cuclark_tpu.parallel.mesh).
    """
    (khi, klo), valid = codec.extract_kmers(codes, k)
    chi, clo = codec.canonical((khi, klo), k)
    labels = probe(table, nb_bits, slots, num_choices, chi, clo)
    labels = jnp.where(valid, labels, 0)
    results = score.score_labels(labels)
    return (results, labels) if with_labels else (results, None)


@dataclass
class ReadBatch:
    """Host-side packed batch."""

    names: list[str]
    codes: np.ndarray    # uint8 [R, L] (INVALID-padded)
    lengths: np.ndarray  # int64 [R] raw sequence char count
    count: int           # actual reads (<= R, rest is padding)


def pack_reads(reads, batch_size: int, length: int) -> ReadBatch:
    """reads: list of (name, seq_bytes). Pads to [batch_size, length]."""
    codes = np.full((batch_size, length), codec.INVALID, dtype=np.uint8)
    lengths = np.zeros(batch_size, dtype=np.int64)
    names = []
    for i, (name, seq) in enumerate(reads):
        enc = codec.encode_ascii(seq)
        n = min(len(enc), length)
        codes[i, :n] = enc[:n]
        lengths[i] = len(seq)
        names.append(name)
    return ReadBatch(names=names, codes=codes, lengths=lengths, count=len(reads))


class Classifier:
    """Holds the device-resident DB and runs batched classification."""

    def __init__(self, db: KmerDB, cfg: ClassifyConfig | None = None,
                 len_bins=DEFAULT_LEN_BINS):
        self.db = db
        self.cfg = cfg or ClassifyConfig()
        self.len_bins = tuple(sorted(len_bins))
        self.table = jnp.asarray(db.table)

    def _bin_for(self, max_len: int) -> int:
        for b in self.len_bins:
            if max_len + 1 <= b:  # +1 so L >= k always and P >= 1
                return b
        return int(np.ceil((max_len + 1) / 128) * 128)

    def _device_step(self, codes: np.ndarray):
        db = self.db
        return classify_step(
            self.table,
            jnp.asarray(codes),
            k=db.k,
            nb_bits=db.nb_bits,
            slots=db.slots,
            num_choices=db.num_choices,
            with_labels=self.cfg.extended,
        )

    # ---------- file fast path ----------

    def classify_file(self, path, paired_path=None):
        """Yield result rows for a whole FASTA/FASTQ file (optionally a
        paired mate file merged with a joining N)."""
        from cuclark_tpu.io import fast_parse, fasta

        buf = _read_file_bytes(path)
        name_s, name_e, seq_s, seq_e = fast_parse.scan_file(buf)
        if paired_path is not None:
            buf2 = _read_file_bytes(paired_path)
            _, _, seq_s2, seq_e2 = fast_parse.scan_file(buf2)
            n = min(len(seq_s), len(seq_s2))
            name_s, name_e = name_s[:n], name_e[:n]
            seq_s, seq_e = seq_s[:n], seq_e[:n]
            seq_s2, seq_e2 = seq_s2[:n], seq_e2[:n]
        else:
            buf2 = None

        B = self.cfg.batch_reads
        inflight = None  # (results_dev, labels_dev, names, lengths, count)
        for lo in range(0, len(seq_s), B):
            hi = min(lo + B, len(seq_s))
            cnt = hi - lo
            codes1, len1 = fast_parse.pack_block_dispatch(
                buf, seq_s[lo:hi], seq_e[lo:hi],
                self._bin_for_range(buf, seq_s[lo:hi], seq_e[lo:hi], buf2,
                                    None if buf2 is None else seq_s2[lo:hi],
                                    None if buf2 is None else seq_e2[lo:hi]),
                n_rows=cnt,
            )
            if buf2 is not None:
                codes, lengths = _merge_paired(
                    codes1, len1, buf2, seq_s2[lo:hi], seq_e2[lo:hi],
                    codes1.shape[1])
            else:
                codes, lengths = codes1, len1
            names = fast_parse.names_of(buf, name_s[lo:hi], name_e[lo:hi])

            out = self._device_step(codes)  # async dispatch
            if inflight is not None:
                yield from self._emit(*inflight, paired=buf2 is not None)
            inflight = (out[0], out[1], names, lengths, cnt)
        if inflight is not None:
            yield from self._emit(*inflight, paired=buf2 is not None)

    def _bin_for_range(self, buf, s, e, buf2, s2, e2) -> int:
        mx = int((e - s).max(initial=1))
        if buf2 is not None:
            mx += int((e2 - s2).max(initial=0)) + 1
        return max(self._bin_for(mx), self.db.k)

    def _emit(self, results_dev, labels_dev, names, lengths, count,
              paired: bool):
        results = np.asarray(results_dev)
        labels_np = np.asarray(labels_dev) if labels_dev is not None else None
        total, ibest, best, isecond, second = (results[:, i] for i in range(5))
        norm, gamma, conf = score.gamma_confidence(
            total, best, second, lengths, self.db.k, paired
        )
        for i in range(count):
            row = {
                "name": names[i],
                "length": int(norm[i]),
                "gamma": float(gamma[i]),
                "total": int(total[i]),
                "index_best": int(ibest[i]),
                "best": int(best[i]),
                "index_second": int(isecond[i]),
                "second": int(second[i]),
                "confidence": float(conf[i]),
            }
            if labels_np is not None:
                lab = labels_np[i]
                lab = lab[lab > 0]
                t, c = np.unique(lab, return_counts=True)
                row["target_counts"] = dict(zip(t.tolist(), c.tolist()))
            yield row

    # ---------- record-iterator path ----------

    def classify_records(self, records, paired: bool = False):
        """records: iterable of (name, seq_bytes).

        Yields per-read result dicts in input order.
        """
        batch = []
        inflight = None
        for rec in records:
            batch.append(rec)
            if len(batch) == self.cfg.batch_reads:
                inflight, out = self._dispatch_batch(batch, inflight, paired)
                yield from out
                batch = []
        if batch:
            inflight, out = self._dispatch_batch(batch, inflight, paired)
            yield from out
        if inflight is not None:
            yield from self._emit(*inflight, paired=paired)

    def _dispatch_batch(self, batch, inflight, paired: bool):
        max_len = max((len(s) for _, s in batch), default=1)
        L = max(self._bin_for(max_len), self.db.k)
        rb = pack_reads(batch, len(batch), L)
        out = self._device_step(rb.codes)
        prev_rows = (
            self._emit(*inflight, paired=paired) if inflight is not None else iter(())
        )
        return (out[0], out[1], rb.names, rb.lengths, rb.count), prev_rows


def _read_file_bytes(path) -> np.ndarray:
    from cuclark_tpu.io.fasta import _open

    with _open(path) as f:
        data = f.read()
    return np.frombuffer(data, dtype=np.uint8)


def _merge_paired(codes1, len1, buf2, s2, e2, width):
    """Append mate-2 codes after a joining INVALID (the 'N' of
    mergePairedFiles, src/file.cc:205-268)."""
    from cuclark_tpu.io import fast_parse

    codes2, len2 = fast_parse.pack_block_dispatch(buf2, s2, e2, width, n_rows=len(s2))
    R = codes1.shape[0]
    L = width
    out = codes1.copy()
    # place mate 2 at offset len1 + 1 per row (vectorized shift-gather)
    col = np.arange(L)[None, :]
    src_col = col - (len1[:, None] + 1)
    take = np.clip(src_col, 0, L - 1)
    shifted = np.take_along_axis(codes2, take, axis=1)
    use = (src_col >= 0) & (src_col < len2[:, None])
    out = np.where(use, shifted, out).astype(np.uint8)
    return out, len1 + len2 + 1
