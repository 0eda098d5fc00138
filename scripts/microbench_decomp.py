"""In-situ decomposition of the classify step at 67 MB vs 1 GB tables.

Established so far (round 3): raw 32 B-row gathers are FLAT in table
size (8.4 ns/row); _probe_q4 alone is ~flat (13.3 -> 15.4 ns/probe);
the per-call-table-cost hypothesis is dead (scan == calls).  Yet the
full step runs 28 ms/chunk at 67 MB and ~59 ms at 1 GB.  So: which
stage combination inflates?  Variants, each amortized over all chunks
per scalar readback:

  full      unpack -> kmers -> canonical -> spread -> probe -> where -> score
  noscore   same minus score_labels (sum labels instead)
  noprobe   same minus probe (sum mixed keys instead)
  probeonly precomputed (chi, clo) on device -> probe -> sum

Run: PYTHONPATH=/root/repo python scripts/microbench_decomp.py
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

from cuclark_tpu import codec, score
from cuclark_tpu.config import DBConfig
from cuclark_tpu.hashdb import build_table
from cuclark_tpu.probe import probe, spread_invalid

K = 31
CHUNK = 16384
N_CHUNKS = 8
OUTER = 3

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, size=2_000_000).astype(np.uint8)
starts = rng.integers(0, len(genome) - 150, size=CHUNK * N_CHUNKS)
codes = genome[starts[:, None] + np.arange(150)[None, :]]
dev_chunks = [tuple(jnp.asarray(a)
                    for a in codec.pack_codes(codes[i: i + CHUNK]))
              for i in range(0, len(codes), CHUNK)]


def run_variant(fn_j, args_list):
    def run():
        acc = jnp.int32(0)
        for args in args_list:
            acc = acc + fn_j(*args)
        return float(np.asarray(acc))

    run()
    best = float("inf")
    for _ in range(OUTER):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best / N_CHUNKS


def bench(db):
    tbl = jnp.asarray(db.table)
    nb_bits, layout, seed = db.nb_bits, db.layout, db.seed

    def stages(p2, vb):
        cs = codec.unpack_codes(p2, vb)
        (khi, klo), valid = codec.extract_kmers(cs, K)
        chi, clo = codec.canonical((khi, klo), K)
        chi, clo = spread_invalid(chi, clo, valid)
        return chi, clo, valid

    @jax.jit
    def full(table, p2, vb):
        chi, clo, valid = stages(p2, vb)
        lab = probe(table, nb_bits, db.slots, db.num_choices, chi, clo,
                    layout=layout, seed=seed, stash_bits=db.stash_bits)
        lab = jnp.where(valid, lab, 0)
        return score.score_labels(lab)[:, 0].sum() % 97

    @jax.jit
    def noscore(table, p2, vb):
        chi, clo, valid = stages(p2, vb)
        lab = probe(table, nb_bits, db.slots, db.num_choices, chi, clo,
                    layout=layout, seed=seed)
        lab = jnp.where(valid, lab, 0)
        return lab.sum() % 97

    @jax.jit
    def noprobe(table, p2, vb):
        chi, clo, valid = stages(p2, vb)
        return (jnp.where(valid, chi.astype(jnp.int32), 0).sum()
                + table[0, 0].astype(jnp.int32)) % 97

    @jax.jit
    def probeonly(table, chi, clo):
        lab = probe(table, nb_bits, db.slots, db.num_choices, chi, clo,
                    layout=layout, seed=seed)
        return lab.sum() % 97

    # precompute mixed inputs on device for probeonly
    pre = []
    for p2, vb in dev_chunks:
        cs = codec.unpack_codes(np.asarray(p2), np.asarray(vb))
        (khi, klo), valid = codec.extract_kmers(jnp.asarray(cs), K)
        chi, clo = codec.canonical((khi, klo), K)
        chi, clo = spread_invalid(chi, clo, jnp.asarray(valid))
        pre.append((jnp.asarray(chi), jnp.asarray(clo)))

    out = {}
    out["full"] = run_variant(full, [(tbl, p2, vb) for p2, vb in dev_chunks])
    out["noscore"] = run_variant(noscore,
                                 [(tbl, p2, vb) for p2, vb in dev_chunks])
    out["noprobe"] = run_variant(noprobe,
                                 [(tbl, p2, vb) for p2, vb in dev_chunks])
    out["probeonly"] = run_variant(probeonly,
                                   [(tbl, c, l) for c, l in pre])
    del tbl
    return out


for n_kmers in (4_000_000, 64_000_000):
    km = rng.integers(0, 1 << 62, size=int(n_kmers * 1.02), dtype=np.uint64)
    km = np.unique(codec.canonical_np(km, K))[:n_kmers]
    labels = rng.integers(1, 1025, size=len(km)).astype(np.uint32)
    names = ["NA"] + [f"T{i}" for i in range(1, 1025)]
    db = build_table(km, labels, names, DBConfig(k=K, target_load=0.85))
    r = bench(db)
    print(f"table={db.table.nbytes / 1e6:6.0f}MB  "
          + "  ".join(f"{k} {v * 1e3:6.2f}ms" for k, v in r.items()),
          flush=True)
