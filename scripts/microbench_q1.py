"""Prototype of the q1 (single-choice + warm stash) probe layout.

Hypothesis from microbench_cold: at >=1 GB tables every random row
gather costs a cold DRAM page miss (~14 ns), so the q4 probe's TWO
cold gathers are the entire at-scale cost.  q1 stores each k-mer in
ONE bucket of the main table (4 slots, 32 B rows, greedy fill) and
spills bucket overflow to a SMALL stash table (same row format,
bucket = other half of the Feistel pair) that stays in the warm-gather
regime.  Probe = one cold gather + one warm gather.

Measures, at a 67 MB-class and a 1 GB-class main table, per-chunk
calls on production-pattern precomputed keys (same harness as
microbench_decomp):

  q4     the shipped 2-cold-gather probe (baseline)
  q1     main gather + stash gather
  q1main main gather only (floor; NOT correct, just the bound)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_q1.py
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
from cuclark_tpu.hashdb import build_table, feistel_mix, feistel_seed_consts
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


def build_q1(kmers, labels, nb_bits, seed=0):
    """Greedy single-choice main fill + stash for overflow.  Returns
    (main[nb,8]u32, stash[nbs,8]u32, nb_bits_s)."""
    hi = (kmers >> np.uint64(32)).astype(np.uint32)
    lo = (kmers & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    h1, l2 = feistel_mix(hi, lo, seed)
    nb = 1 << nb_bits
    mask = np.uint32(nb - 1)
    b = (l2 & mask).astype(np.int64)

    order = np.argsort(b, kind="stable")
    sb = b[order]
    first = np.r_[True, sb[1:] != sb[:-1]]
    run_start = np.flatnonzero(first)
    run_id = np.cumsum(first) - 1
    rank = np.arange(len(sb)) - run_start[run_id]
    fits = rank < 4
    main = np.zeros((nb, 8), dtype=np.uint32)
    pi = order[fits]
    main[sb[fits], rank[fits]] = h1[pi]
    main[sb[fits], rank[fits] + 4] = (
        ((l2[pi] >> np.uint32(nb_bits)) << np.uint32(17))
        | labels[pi].astype(np.uint32))

    # stash: bucket from h1
    si = order[~fits]
    nbs_bits = 17
    while True:
        nbs = 1 << nbs_bits
        smask = np.uint32(nbs - 1)
        sbk = (h1[si] & smask).astype(np.int64)
        o2 = np.argsort(sbk, kind="stable")
        ssb = sbk[o2]
        f2 = np.r_[True, ssb[1:] != ssb[:-1]]
        rs2 = np.flatnonzero(f2)
        rid2 = np.cumsum(f2) - 1
        rank2 = np.arange(len(ssb)) - rs2[rid2]
        if (rank2 < 4).all():
            break
        nbs_bits += 1
    stash = np.zeros((nbs, 8), dtype=np.uint32)
    pj = si[o2]
    stash[ssb, rank2] = l2[pj]
    stash[ssb, rank2 + 4] = (
        ((h1[pj] >> np.uint32(nbs_bits)) << np.uint32(17))
        | labels[pj].astype(np.uint32))
    print(f"  q1 build: {len(si)}/{len(kmers)} "
          f"({100 * len(si) / len(kmers):.2f}%) in stash, "
          f"stash {nbs * 32 / 1e6:.0f}MB", flush=True)
    return main, stash, nbs_bits


def bench(db, q1parts):
    tbl = jnp.asarray(db.table)
    main_np, stash_np, nbs_bits = q1parts
    main = jnp.asarray(main_np)
    stash = jnp.asarray(stash_np)
    nb_bits, seed = db.nb_bits, db.seed
    mask = jnp.uint32((1 << nb_bits) - 1)
    smask = jnp.uint32((1 << nbs_bits) - 1)

    pre = []
    for p2, vb in dev_chunks:
        cs = codec.unpack_codes(np.asarray(p2), np.asarray(vb))
        (khi, klo), valid = codec.extract_kmers(jnp.asarray(cs), K)
        chi, clo = codec.canonical((khi, klo), K)
        chi, clo = spread_invalid(chi, clo, jnp.asarray(valid))
        pre.append((jnp.asarray(chi).reshape(-1),
                    jnp.asarray(clo).reshape(-1)))

    def cmp_rows(rows, other, own, bits, label_mask=0x1FFFF):
        meta = rows[:, 4:]
        m = ((rows[:, :4] == other[:, None])
             & ((meta >> jnp.uint32(17)) == (own >> jnp.uint32(bits))[:, None]))
        return jnp.sum(
            jnp.where(m, (meta & jnp.uint32(0xFFFF)).astype(jnp.int32), 0),
            axis=1)

    def cmp_rows_q4(rows, other, own, choice):
        meta = rows[:, 4:]
        m = ((rows[:, :4] == other[:, None])
             & ((meta >> jnp.uint32(17)) == (own >> jnp.uint32(nb_bits))[:, None])
             & (((meta >> jnp.uint32(16)) & jnp.uint32(1)) == choice))
        return jnp.sum(
            jnp.where(m, (meta & jnp.uint32(0xFFFF)).astype(jnp.int32), 0),
            axis=1)

    @jax.jit
    def q4(table, chi, clo):
        h1, l2 = feistel_mix(chi, clo, seed)
        lab = jnp.zeros(chi.shape, jnp.int32)
        for choice, own, other in ((0, l2, h1), (1, h1, l2)):
            bq = (own & mask).astype(jnp.int32)
            rows = jnp.take(table, bq, axis=0)
            lab += cmp_rows_q4(rows, other, own, choice)
        return lab.sum() % 97

    @jax.jit
    def q1(main, stash, chi, clo):
        h1, l2 = feistel_mix(chi, clo, seed)
        rows = jnp.take(main, (l2 & mask).astype(jnp.int32), axis=0)
        lab = cmp_rows(rows, h1, l2, nb_bits)
        srows = jnp.take(stash, (h1 & smask).astype(jnp.int32), axis=0)
        lab += cmp_rows(srows, l2, h1, nbs_bits)
        return lab.sum() % 97

    @jax.jit
    def q1main(main, chi, clo):
        h1, l2 = feistel_mix(chi, clo, seed)
        rows = jnp.take(main, (l2 & mask).astype(jnp.int32), axis=0)
        return cmp_rows(rows, h1, l2, nb_bits).sum() % 97

    out = {}
    out["q4"] = run_variant(q4, [(tbl, c, l) for c, l in pre])
    out["q1"] = run_variant(q1, [(main, stash, c, l) for c, l in pre])
    out["q1main"] = run_variant(q1main, [(main, c, l) for c, l in pre])
    del tbl, main, stash
    return out


for n_kmers in (4_000_000, 64_000_000):
    km = rng.integers(0, 1 << 62, size=int(n_kmers * 1.02), dtype=np.uint64)
    km = np.unique(codec.canonical_np(km, K))[:n_kmers]
    labels = rng.integers(1, 1025, size=len(km)).astype(np.uint32)
    names = ["NA"] + [f"T{i}" for i in range(1, 1025)]
    db = build_table(km, labels, names, DBConfig(k=K, target_load=0.85))
    q1parts = build_q1(km, labels, db.nb_bits, seed=db.seed)
    # correctness spot-check of the prototype build: probe 100K stored
    # k-mers in numpy
    idx = rng.choice(len(km), 100_000, replace=False)
    hi = (km[idx] >> np.uint64(32)).astype(np.uint32)
    lo = (km[idx] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    h1, l2 = feistel_mix(hi, lo, db.seed)
    main_np, stash_np, nbs_bits = q1parts
    got = np.zeros(len(idx), np.int32)
    for tblp, bkt, own, other, bits in (
            (main_np, l2 & np.uint32((1 << db.nb_bits) - 1), l2, h1,
             db.nb_bits),
            (stash_np, h1 & np.uint32((1 << nbs_bits) - 1), h1, l2,
             nbs_bits)):
        rows = tblp[bkt.astype(np.int64)]
        meta = rows[:, 4:]
        m = ((rows[:, :4] == other[:, None])
             & ((meta >> np.uint32(17)) == (own >> np.uint32(bits))[:, None]))
        got += np.where(m, (meta & np.uint32(0xFFFF)).astype(np.int32),
                        0).sum(axis=1)
    assert (got == labels[idx].astype(np.int32)).all(), "q1 probe-back failed"
    r = bench(db, q1parts)
    tot = CHUNK * 8
    print(f"table={db.table.nbytes / 1e6:6.0f}MB  "
          + "  ".join(f"{k} {v * 1e3:6.2f}ms ({CHUNK / v:,.0f} r/s)"
                      for k, v in r.items()),
          flush=True)
