"""End-to-end classification pipeline.

The TPU analog of the reference orchestrator CuCLARK::runSimple +
getObjectsDataComputeFullGPU (src/CuCLARK_hh.hh:511-573, 1335-1788):
host packs reads into fixed-shape code batches; one jitted device step
does k-mer extraction -> canonicalization -> table probe -> scoring;
the host formats CLARK CSV rows.  The reference's pinned-buffer batch
machinery, CUDA events and OpenMP critical sections disappear — XLA's
async dispatch pipelines host packing against device compute, and
fixed (batch, length-bin) shapes keep everything compile-once.
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
    jax.jit, static_argnames=("k", "nb_bits", "slots", "num_choices")
)
def classify_step(table, codes, *, k, nb_bits, slots, num_choices):
    """One device step: codes [R, L] -> results [R, 5] (+ labels [R, P]).

    Single-chip version (sharded variant in cuclark_tpu.parallel.mesh).
    """
    (khi, klo), valid = codec.extract_kmers(codes, k)
    chi, clo = codec.canonical((khi, klo), k)
    labels = probe(table, nb_bits, slots, num_choices, chi, clo)
    labels = jnp.where(valid, labels, 0)
    return score.score_labels(labels), labels


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

    def classify_records(self, records, paired: bool = False):
        """records: iterable of (name, seq_bytes).

        Yields per-read result dicts in input order.
        """
        db = self.db
        batch = []
        for rec in records:
            batch.append(rec)
            if len(batch) == self.cfg.batch_reads:
                yield from self._run_batch(batch, paired)
                batch = []
        if batch:
            yield from self._run_batch(batch, paired)

    def _run_batch(self, batch, paired: bool):
        db = self.db
        max_len = max((len(s) for _, s in batch), default=1)
        L = max(self._bin_for(max_len), db.k)
        rb = pack_reads(batch, len(batch), L)
        results, labels = classify_step(
            self.table,
            jnp.asarray(rb.codes),
            k=db.k,
            nb_bits=db.nb_bits,
            slots=db.slots,
            num_choices=db.num_choices,
        )
        results = np.asarray(results)
        labels_np = np.asarray(labels) if self.cfg.extended else None
        total, ibest, best, isecond, second = (results[:, i] for i in range(5))
        norm, gamma, conf = score.gamma_confidence(
            total, best, second, rb.lengths, db.k, paired
        )
        for i in range(rb.count):
            row = {
                "name": rb.names[i],
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
