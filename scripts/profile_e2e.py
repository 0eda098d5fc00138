"""Profile the e2e file->CSV path: where do the ~3 us/read of host
overhead go?  cProfile over classify_file_to_csv on a synthetic FASTQ.
Run from /root/repo (PYTHONPATH includes .axon_site for TPU)."""

import cProfile
import io
import os
import pstats
import tempfile
import time
from pathlib import Path

import numpy as np

from cuclark_tpu import codec
from cuclark_tpu.config import ClassifyConfig, DBConfig
from cuclark_tpu.hashdb import build_table
from cuclark_tpu.pipeline import Classifier

N_READS = int(os.environ.get("N", 200_000))
N_KMERS = int(os.environ.get("KMERS", 4_000_000))
N_TARGETS = int(os.environ.get("TARGETS", 1024))
rng = np.random.default_rng(0)
km = np.unique(codec.canonical_np(
    rng.integers(0, 1 << 62, size=int(N_KMERS * 1.05), dtype=np.uint64),
    31))[:N_KMERS]
labels = rng.integers(1, N_TARGETS + 1, size=len(km)).astype(np.uint32)
db = build_table(km, labels,
                 ["NA"] + [f"T{i}" for i in range(1, N_TARGETS + 1)],
                 DBConfig(k=31, target_load=0.85))
print(f"db: {db.table.nbytes / 1e6:.0f}MB split={db.use_split_probe()}",
      flush=True)

genome = rng.integers(0, 4, size=2_000_000).astype(np.uint8)
starts = rng.integers(0, len(genome) - 150, size=N_READS)
rows = genome[starts[:, None] + np.arange(150)[None, :]]
seq = np.frombuffer(b"ACGT", np.uint8)[rows]

with tempfile.TemporaryDirectory() as td:
    fq = Path(td) / "r.fq"
    qual = b"I" * 150
    with open(fq, "wb") as f:
        f.write(b"".join(b"@r%d\n%s\n+\n%s\n" % (i, seq[i].tobytes(), qual)
                         for i in range(N_READS)))
    clf = Classifier(db, ClassifyConfig(batch_reads=16384))
    out = Path(td) / "o.csv"
    clf.classify_file_to_csv(fq, out)  # warmup/compile

    t0 = time.time()
    pr = cProfile.Profile()
    pr.enable()
    n = clf.classify_file_to_csv(fq, out)
    pr.disable()
    dt = time.time() - t0
    print(f"e2e: {n} reads in {dt:.2f}s = {n/dt:,.0f} reads/s", flush=True)
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())
