"""Is the at-scale classify drop a PER-CALL, table-size-proportional
cost?  The probe math is ~flat amortized inside fori (15.4 ns/probe at
1 GB, microbench_gather_size2), yet the per-chunk step loses ~27 ms per
call at 1 GB.  Hypothesis: a table-size-proportional per-invocation
cost (input relayout copy or similar).  Compare, at 67 MB and 1 GB:

  A. 4 separate classify_step_packed calls (the production pattern)
  B. one jitted call scanning the 4 chunks stacked (table touched once)
  C. a trivial jitted table no-op per chunk-call (measures the pure
     per-call table cost without any probing)
Run: PYTHONPATH=/root/repo python scripts/microbench_percall.py
"""

import os
import time

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
OUTER = 4

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, size=2_000_000).astype(np.uint8)
starts = rng.integers(0, len(genome) - 150, size=CHUNK * N_CHUNKS)
codes = genome[starts[:, None] + np.arange(150)[None, :]]
chunks = [codec.pack_codes(codes[i: i + CHUNK])
          for i in range(0, len(codes), CHUNK)]
dev_chunks = [tuple(jnp.asarray(a) for a in c) for c in chunks]
p2_stack = jnp.asarray(np.stack([c[0] for c in chunks]))
vb_stack = jnp.asarray(np.stack([c[1] for c in chunks]))


def bench(db):
    tbl = jnp.asarray(db.table)

    def run_calls():
        acc = jnp.int32(0)
        for p2, vb in dev_chunks:
            r, _ = classify_step_packed(
                tbl, p2, vb, k=db.k, nb_bits=db.nb_bits, slots=db.slots,
                num_choices=db.num_choices, layout=db.layout, seed=db.seed,
                with_labels=False)
            acc = acc + r[:, 0].sum() % 97
        return float(np.asarray(acc))

    from cuclark_tpu import score
    from cuclark_tpu.probe import probe, spread_invalid

    def one_stacked(table, p2s, vbs):
        def body(acc, pv):
            p2, vb = pv
            cs = codec.unpack_codes(p2, vb)
            (khi, klo), valid = codec.extract_kmers(cs, db.k)
            chi, clo = codec.canonical((khi, klo), db.k)
            chi, clo = spread_invalid(chi, clo, valid)
            lab = probe(table, db.nb_bits, db.slots, db.num_choices,
                        chi, clo, layout=db.layout, seed=db.seed)
            lab = jnp.where(valid, lab, 0)
            r = score.score_labels(lab)
            return acc + r[:, 0].sum() % 97, None
        acc, _ = jax.lax.scan(body, jnp.int32(0), (p2s, vbs))
        return acc

    scan_j = jax.jit(one_stacked)

    def run_scan():
        return float(np.asarray(scan_j(tbl, p2_stack, vb_stack)))

    noop_j = jax.jit(lambda t, p2: t[0, 0].astype(jnp.int32)
                     + p2[0, 0].astype(jnp.int32))

    def run_noop():
        acc = 0
        for p2, vb in dev_chunks:
            acc += int(np.asarray(noop_j(tbl, p2)))
        return acc

    out = {}
    for name, fn in (("calls", run_calls), ("scan", run_scan),
                     ("noop", run_noop)):
        fn()
        best = float("inf")
        for _ in range(OUTER):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        out[name] = best
    del tbl
    return out


for n_kmers in (4_000_000, 64_000_000):
    km = rng.integers(0, 1 << 62, size=int(n_kmers * 1.02), dtype=np.uint64)
    km = np.unique(codec.canonical_np(km, K))[:n_kmers]
    labels = rng.integers(1, 1025, size=len(km)).astype(np.uint32)
    names = ["NA"] + [f"T{i}" for i in range(1, 1025)]
    db = build_table(km, labels, names, DBConfig(k=K, target_load=0.85))
    r = bench(db)
    n = CHUNK * N_CHUNKS
    print(f"table={db.table.nbytes / 1e6:6.0f}MB"
          f"  calls {n / r['calls']:9,.0f} r/s"
          f"  scan {n / r['scan']:9,.0f} r/s"
          f"  noop-4calls {r['noop'] * 1e3:6.1f} ms", flush=True)
