"""q8 design-point timing sweep: one 64 B-row main gather + one small
stash gather.

microbench_q1 established: per-call at 1 GB, ONE 32 B cold gather
chain = 29.3 ms/chunk (560K r/s floor) while the shipped two-gather q4
= 55 ms (296K).  The open questions before integrating a new layout:

  1. cold64: does a 64 B-row gather cost the same as 32 B when page-
     miss bound?  (8-slot buckets cut overflow to ~0.6% vs 3.3% for
     4-slot, so the stash shrinks 5x.)
  2. what does a SMALL stash gather add per chunk, vs stash size
     (4 MB / 17 MB / 34 MB)?  Content is dummy; timing only.

Variants (chunk-call pattern, precomputed keys, amortized):
  m64        64 B-row main gather + 8-slot compare (no stash) — floor
  m64+s4     + 32 B-row stash gather at 4 MB
  m64+s17    + stash at 16.8 MB
  m64+s34    + stash at 33.6 MB

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_q8.py
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
from cuclark_tpu.hashdb import feistel_mix
from cuclark_tpu.probe import spread_invalid

K = 31
CHUNK = 16384
N_CHUNKS = 8
OUTER = 3

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, size=2_000_000).astype(np.uint8)
starts = rng.integers(0, len(genome) - 150, size=CHUNK * N_CHUNKS)
codes = genome[starts[:, None] + np.arange(150)[None, :]]

pre = []
for i in range(0, len(codes), CHUNK):
    p2, vb = codec.pack_codes(codes[i: i + CHUNK])
    cs = codec.unpack_codes(p2, vb)
    (khi, klo), valid = codec.extract_kmers(jnp.asarray(cs), K)
    chi, clo = codec.canonical((khi, klo), K)
    chi, clo = spread_invalid(chi, clo, jnp.asarray(valid))
    pre.append((jnp.asarray(chi).reshape(-1), jnp.asarray(clo).reshape(-1)))


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


def bench(nb8_bits):
    nb8 = 1 << nb8_bits
    main = jnp.asarray(rng.integers(0, 1 << 32, size=(nb8, 16),
                                    dtype=np.uint64).astype(np.uint32))
    mask = jnp.uint32(nb8 - 1)

    def main_probe(table, chi, clo):
        h1, l2 = feistel_mix(chi, clo, 0)
        rows = jnp.take(table, (l2 & mask).astype(jnp.int32), axis=0)
        meta = rows[:, 8:]
        m = ((rows[:, :8] == h1[:, None])
             & ((meta >> jnp.uint32(16))
                == (l2 >> jnp.uint32(nb8_bits))[:, None]))
        return jnp.sum(jnp.where(
            m, (meta & jnp.uint32(0xFFFF)).astype(jnp.int32), 0), axis=1), h1, l2

    @jax.jit
    def m64(table, chi, clo):
        lab, _, _ = main_probe(table, chi, clo)
        return lab.sum() % 97

    def make_with_stash(sbits):
        smask = jnp.uint32((1 << sbits) - 1)

        @jax.jit
        def f(table, stash, chi, clo):
            lab, h1, l2 = main_probe(table, chi, clo)
            srows = jnp.take(stash, (h1 & smask).astype(jnp.int32), axis=0)
            smeta = srows[:, 4:]
            sm = ((srows[:, :4] == l2[:, None])
                  & ((smeta >> jnp.uint32(17))
                     == (h1 >> jnp.uint32(sbits))[:, None]))
            lab = lab + jnp.sum(jnp.where(
                sm, (smeta & jnp.uint32(0xFFFF)).astype(jnp.int32), 0), axis=1)
            return lab.sum() % 97
        return f

    out = {}
    out["m64"] = run_variant(m64, [(main, c, l) for c, l in pre])
    for sbits in (17, 19, 20):
        stash = jnp.asarray(rng.integers(0, 1 << 32, size=(1 << sbits, 8),
                                         dtype=np.uint64).astype(np.uint32))
        out[f"s{sbits}"] = run_variant(
            make_with_stash(sbits), [(main, stash, c, l) for c, l in pre])
        del stash
    del main
    return out


for nb8_bits in (20, 24):
    r = bench(nb8_bits)
    print(f"main={(1 << nb8_bits) * 64 / 1e6:6.0f}MB  "
          + "  ".join(f"{k} {v * 1e3:6.2f}ms ({CHUNK / v:,.0f} r/s)"
                      for k, v in r.items()),
          flush=True)
