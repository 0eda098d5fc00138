"""Is the q4 probe really flat in table size? bench.py's at-scale run
(1 GB table) measured 273 K reads/s vs 645 K at 67 MB. Isolate: same
step, same reads, tables of 67 MB / 268 MB / 1 GB, 3 reps each, and a
16384-target variant at 67 MB to separate scoring from table size.
Run from /root/repo."""

import time

import os

import numpy as np
import jax
import jax.numpy as jnp

cache = os.path.join(os.path.expanduser("~"), ".cache", "cuclark_tpu", "xla")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cuclark_tpu import codec
from cuclark_tpu.config import DBConfig
from cuclark_tpu.hashdb import build_table
from cuclark_tpu.pipeline import classify_step_packed

K = 31
CHUNK = 16384
N_CHUNKS = 4

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, size=2_000_000).astype(np.uint8)
starts = rng.integers(0, len(genome) - 150, size=CHUNK * N_CHUNKS)
codes = genome[starts[:, None] + np.arange(150)[None, :]]
dev_chunks = [tuple(jnp.asarray(a)
                    for a in codec.pack_codes(codes[i: i + CHUNK]))
              for i in range(0, len(codes), CHUNK)]


def bench(db):
    tbl = jnp.asarray(db.table)

    def run():
        acc = jnp.int32(0)
        for p2, vb in dev_chunks:
            r, _ = classify_step_packed(
                tbl, p2, vb, k=db.k, nb_bits=db.nb_bits, slots=db.slots,
                num_choices=db.num_choices, layout=db.layout, seed=db.seed,
                with_labels=False)
            acc = acc + r[:, 0].sum() % 97
        return float(np.asarray(acc))

    run()
    best = min(_timed(run) for _ in range(3))
    del tbl
    return CHUNK * N_CHUNKS / best


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


for n_kmers, n_targets in ((4_000_000, 1024), (4_000_000, 16384),
                           (64_000_000, 1024)):
    km = rng.integers(0, 1 << 62, size=int(n_kmers * 1.02), dtype=np.uint64)
    km = np.unique(codec.canonical_np(km, K))[:n_kmers]
    labels = rng.integers(1, n_targets + 1, size=len(km)).astype(np.uint32)
    names = ["NA"] + [f"T{i}" for i in range(1, n_targets + 1)]
    db = build_table(km, labels, names, DBConfig(k=K, target_load=0.85))
    rps = bench(db)
    print(f"kmers={n_kmers} targets={n_targets} "
          f"table={db.table.nbytes/1e6:.0f}MB nb_bits={db.nb_bits} "
          f"reads/s={rps:,.0f}", flush=True)
