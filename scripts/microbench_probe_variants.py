"""Why does the in-situ probe gather slow 2.3x with table size when an
isolated take+sum does not?  Suspicion: XLA fuses the gather with its
compare/select consumers (or with the feistel index producers) into a
loop whose codegen degrades on large operands.  Variants at 67 MB and
1 GB, all per-chunk calls (production pattern), amortized over 8 chunks
per readback:

  base      _probe_q4 on precomputed (chi, clo)      [repeat of decomp]
  barrier   take -> optimization_barrier -> compare  (blocks fusion)
  concat    ONE take of the concatenated b1|b2 index vector
  paramidx  bucket indices as jit PARAMETERS -> take -> compare -> sum

Run: PYTHONPATH=/root/repo python scripts/microbench_probe_variants.py
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
from cuclark_tpu.hashdb import build_table, feistel_mix
from cuclark_tpu.probe import spread_invalid

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


def compare_rows(rows, other, own, nb_bits, choice):
    meta = rows[:, 4:]
    m = ((rows[:, :4] == other[:, None])
         & ((meta >> jnp.uint32(17)) == (own >> jnp.uint32(nb_bits))[:, None])
         & (((meta >> jnp.uint32(16)) & jnp.uint32(1)) == choice))
    return jnp.sum(jnp.where(m, (meta & jnp.uint32(0xFFFF)).astype(jnp.int32),
                             0), axis=1)


def bench(db):
    tbl = jnp.asarray(db.table)
    nb_bits, seed = db.nb_bits, db.seed
    mask = jnp.uint32((1 << nb_bits) - 1)

    # device-side precompute of (chi, clo) per chunk
    pre = []
    for p2, vb in dev_chunks:
        cs = codec.unpack_codes(np.asarray(p2), np.asarray(vb))
        (khi, klo), valid = codec.extract_kmers(jnp.asarray(cs), K)
        chi, clo = codec.canonical((khi, klo), K)
        chi, clo = spread_invalid(chi, clo, jnp.asarray(valid))
        pre.append((jnp.asarray(chi).reshape(-1),
                    jnp.asarray(clo).reshape(-1)))

    @jax.jit
    def base(table, chi, clo):
        h1, l2 = feistel_mix(chi, clo, seed)
        lab = jnp.zeros(chi.shape, jnp.int32)
        for choice, own, other in ((0, l2, h1), (1, h1, l2)):
            b = (own & mask).astype(jnp.int32)
            rows = jnp.take(table, b, axis=0)
            lab += compare_rows(rows, other, own, nb_bits, choice)
        return lab.sum() % 97

    @jax.jit
    def barrier(table, chi, clo):
        h1, l2 = feistel_mix(chi, clo, seed)
        lab = jnp.zeros(chi.shape, jnp.int32)
        for choice, own, other in ((0, l2, h1), (1, h1, l2)):
            b = (own & mask).astype(jnp.int32)
            rows = jnp.take(table, b, axis=0)
            rows = jax.lax.optimization_barrier(rows)
            lab += compare_rows(rows, other, own, nb_bits, choice)
        return lab.sum() % 97

    @jax.jit
    def concat(table, chi, clo):
        h1, l2 = feistel_mix(chi, clo, seed)
        b = jnp.concatenate([(l2 & mask), (h1 & mask)]).astype(jnp.int32)
        rows = jnp.take(table, b, axis=0)
        n = chi.shape[0]
        lab = compare_rows(rows[:n], h1, l2, nb_bits, 0)
        lab += compare_rows(rows[n:], l2, h1, nb_bits, 1)
        return lab.sum() % 97

    @jax.jit
    def paramidx(table, b1, b2, h1, l2):
        rows = jnp.take(table, b1, axis=0)
        lab = compare_rows(rows, h1, l2, nb_bits, 0)
        rows = jnp.take(table, b2, axis=0)
        lab += compare_rows(rows, l2, h1, nb_bits, 1)
        return lab.sum() % 97

    prm = []
    for chi, clo in pre:
        h1, l2 = feistel_mix(chi, clo, seed)
        prm.append((jnp.asarray((l2 & mask).astype(jnp.int32)),
                    jnp.asarray((h1 & mask).astype(jnp.int32)),
                    jnp.asarray(h1), jnp.asarray(l2)))

    out = {}
    out["base"] = run_variant(base, [(tbl, c, l) for c, l in pre])
    out["barrier"] = run_variant(barrier, [(tbl, c, l) for c, l in pre])
    out["concat"] = run_variant(concat, [(tbl, c, l) for c, l in pre])
    out["paramidx"] = run_variant(
        paramidx, [(tbl, b1, b2, h1, l2) for b1, b2, h1, l2 in prm])
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
