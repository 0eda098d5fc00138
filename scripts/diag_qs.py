"""Diagnose the qs production regressions seen in bench r03:
  (a) at-scale step 86.7 ms/chunk vs the 37 ms prototype —
      same-array stash take vs separate-array stash take?
  (b) e2e_small at 339 reads/s — streaming misfire from the
      memory planner's limit - in_use reading?

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_qs.py
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
from cuclark_tpu import memplan

dev = jax.devices()[0]
print("memory_stats:", dev.memory_stats(), flush=True)
print("budget_mb:", memplan.device_memory_budget_mb(), flush=True)

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


def run_variant(fn, args_list):
    def run():
        acc = jnp.int32(0)
        for args in args_list:
            acc = acc + fn(*args)
        return float(np.asarray(acc))

    run()
    best = float("inf")
    for _ in range(OUTER):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best / N_CHUNKS


for n_kmers in (4_000_000, 64_000_000):
    km = rng.integers(0, 1 << 62, size=int(n_kmers * 1.02), dtype=np.uint64)
    km = np.unique(codec.canonical_np(km, K))[:n_kmers]
    labels = rng.integers(1, 1025, size=len(km)).astype(np.uint32)
    names = ["NA"] + [f"T{i}" for i in range(1, 1025)]
    db = build_table(km, labels, names, DBConfig(k=K, target_load=0.85))
    print(f"db: rows={db.total_rows} nb_bits={db.nb_bits} "
          f"stash_bits={db.stash_bits} mb={db.table.nbytes / 1e6:.0f}",
          flush=True)

    # production step, same-array
    tbl = jnp.asarray(db.table)

    def step(table, p2, vb):
        r, _ = classify_step_packed(
            table, p2, vb, k=db.k, nb_bits=db.nb_bits, slots=db.slots,
            num_choices=db.num_choices, layout=db.layout, seed=db.seed,
            stash_bits=db.stash_bits, with_labels=False)
        return r[:, 0].sum() % 97

    t_same = run_variant(step, [(tbl, p2, vb) for p2, vb in dev_chunks])

    # split-array probe: main and stash as separate gather operands
    from cuclark_tpu.hashdb import feistel_mix
    from cuclark_tpu.probe import spread_invalid
    from cuclark_tpu import score as score_mod

    main = jnp.asarray(db.table[:db.nb])
    stash = jnp.asarray(db.table[db.nb:])
    mask = jnp.uint32(db.nb - 1)
    smask = jnp.uint32((1 << db.stash_bits) - 1)
    nbb = jnp.uint32(db.nb_bits)
    sbb = jnp.uint32(db.stash_bits)

    @jax.jit
    def step_split(main, stash, p2, vb):
        cs = codec.unpack_codes(p2, vb)
        (khi, klo), valid = codec.extract_kmers(cs, K)
        chi, clo = codec.canonical((khi, klo), K)
        chi, clo = spread_invalid(chi, clo, valid)
        sh = chi.shape
        h1, l2 = feistel_mix(chi.reshape(-1), clo.reshape(-1), db.seed)
        lab = jnp.zeros(h1.shape, jnp.int32)
        for tblp, own, other, bits, bkt, choice in (
                (main, l2, h1, nbb, (l2 & mask), 0),
                (stash, h1, l2, sbb, (h1 & smask), 1)):
            rows = jnp.take(tblp, bkt.astype(jnp.int32), axis=0)
            meta = rows[:, 4:]
            m = ((rows[:, :4] == other[:, None])
                 & ((meta >> jnp.uint32(17)) == (own >> bits)[:, None])
                 & (((meta >> jnp.uint32(16)) & jnp.uint32(1)) == choice))
            lab += jnp.sum(jnp.where(
                m, (meta & jnp.uint32(0xFFFF)).astype(jnp.int32), 0), axis=1)
        lab = jnp.where(valid.reshape(-1), lab, 0).reshape(sh)
        r = score_mod.score_labels(lab)
        return r[:, 0].sum() % 97

    t_split = run_variant(step_split,
                          [(main, stash, p2, vb) for p2, vb in dev_chunks])
    print(f"  same-array {t_same * 1e3:6.2f}ms ({CHUNK / t_same:,.0f} r/s)"
          f"  split-array {t_split * 1e3:6.2f}ms "
          f"({CHUNK / t_split:,.0f} r/s)", flush=True)
    del tbl, main, stash

# (b) what budget does the planner see with a big table resident?
big = jnp.zeros((1 << 25, 8), jnp.uint32)  # 1 GB
jax.block_until_ready(big)
print("budget with 1GB live:", memplan.device_memory_budget_mb(),
      "stats:", dev.memory_stats(), flush=True)
del big
