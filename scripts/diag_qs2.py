"""Is the at-scale step slower at 16384 targets than at 1024 (bench
87 ms/chunk fused vs diag 57 ms)?  Times the production
classify_step_packed at the 64M-kmer / 1 GB config for both target
counts, split and fused.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_qs2.py
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
N_CHUNKS = 8
OUTER = 3

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, size=2_000_000).astype(np.uint8)
starts = rng.integers(0, len(genome) - 150, size=CHUNK * N_CHUNKS)
codes = genome[starts[:, None] + np.arange(150)[None, :]]
dev_chunks = [tuple(jnp.asarray(a)
                    for a in codec.pack_codes(codes[i: i + CHUNK]))
              for i in range(0, len(codes), CHUNK)]


def run(db, table, stash):
    def go():
        acc = jnp.int32(0)
        for p2, vb in dev_chunks:
            r, _ = classify_step_packed(
                table, p2, vb, k=db.k, nb_bits=db.nb_bits, slots=db.slots,
                num_choices=db.num_choices, layout=db.layout, seed=db.seed,
                stash_bits=db.stash_bits, stash=stash, with_labels=False)
            acc = acc + r[:, 0].sum() % 97
        return float(np.asarray(acc))

    go()
    best = float("inf")
    for _ in range(OUTER):
        t0 = time.perf_counter()
        go()
        best = min(best, time.perf_counter() - t0)
    return best / N_CHUNKS


for n_targets in (1024, 16384):
    km = rng.integers(0, 1 << 62, size=int(64_000_000 * 1.02),
                      dtype=np.uint64)
    km = np.unique(codec.canonical_np(km, K))[:64_000_000]
    labels = rng.integers(1, n_targets + 1, size=len(km)).astype(np.uint32)
    names = ["NA"] + [f"T{i}" for i in range(1, n_targets + 1)]
    db = build_table(km, labels, names, DBConfig(k=K, target_load=0.85))
    main_np, stash_np = db.split_tables()
    table = jnp.asarray(main_np)
    stash = jnp.asarray(stash_np)
    t_split = run(db, table, stash)
    del table, stash
    table = jnp.asarray(db.table)
    t_fused = run(db, table, None)
    del table
    print(f"targets={n_targets:5d}  split {t_split * 1e3:6.2f}ms "
          f"({CHUNK / t_split:,.0f} r/s)  fused {t_fused * 1e3:6.2f}ms "
          f"({CHUNK / t_fused:,.0f} r/s)", flush=True)
