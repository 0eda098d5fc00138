"""Corrected cold-gather scaling sweep.

The earlier "gather is flat in table size" harness (microbench_gather_
size2) perturbed ONE index vector with `idx ^ i` inside a fori loop —
iterations 1..7 re-gather rows within +-7 of iteration 0's rows, i.e.
near-perfect DRAM page locality, so it measured the WARM rate at large
tables.  decomp/probe_variants show the production per-call pattern
pays ~14 ns/row at 1 GB vs ~6 ns at 67 MB.  This sweep times, per
table size, a fori loop over 8 INDEPENDENT precomputed index vectors
(cold pattern, same amortization), and the levers a redesign could
pull:

  cold32    8 distinct idx vectors, 32 B rows, full row consumed
  xor32     the old idx^i pattern (expected fast at all sizes: artifact)
  cold64    distinct vectors, 64 B rows  (is cost per-row or per-byte
            when page-miss bound?  if per-row, an 8-slot one-gather
            layout halves probe cost)
  sort32    distinct vectors, HOST-presorted ascending (locality
            ceiling: what would perfect bucket-ordering buy?)
  half32    two takes of M/2 each iter (ILP check in cold regime)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_cold.py
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

M = 2_000_000
INNER = 8
OUTER = 3


def timed(fn, *args):
    fn_j = jax.jit(fn)
    _ = float(np.asarray(fn_j(*args)))
    best = float("inf")
    for _ in range(OUTER):
        t0 = time.perf_counter()
        _ = float(np.asarray(fn_j(*args)))
        best = min(best, time.perf_counter() - t0)
    return best / INNER


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)
    for nb_bits in (21, 23, 25, 26):
        nb = 1 << nb_bits
        tbl32 = jnp.asarray(
            rng.integers(0, 1 << 32, size=(nb, 8),
                         dtype=np.uint64).astype(np.uint32))
        idx_np = rng.integers(0, nb, size=(INNER, M)).astype(np.int32)
        idxs = jnp.asarray(idx_np)
        idx0 = jnp.asarray(idx_np[0])
        sidx = jnp.asarray(np.sort(idx_np, axis=1))
        mask = jnp.int32(nb - 1)

        def cold(table, idxs):
            def body(i, acc):
                rows = jnp.take(table, idxs[i], axis=0)
                return acc + jnp.sum(rows.astype(jnp.int32))
            return jax.lax.fori_loop(0, INNER, body, jnp.int32(0))

        def xor(table, idx):
            def body(i, acc):
                rows = jnp.take(table, jnp.bitwise_and(
                    jnp.bitwise_xor(idx, i), mask), axis=0)
                return acc + jnp.sum(rows.astype(jnp.int32))
            return jax.lax.fori_loop(0, INNER, body, jnp.int32(0))

        def half(table, idxs):
            def body(i, acc):
                a = jnp.take(table, idxs[i, :M // 2], axis=0)
                b = jnp.take(table, idxs[i, M // 2:], axis=0)
                return (acc + jnp.sum(a.astype(jnp.int32))
                        + jnp.sum(b.astype(jnp.int32)))
            return jax.lax.fori_loop(0, INNER, body, jnp.int32(0))

        r = {}
        r["cold32"] = timed(cold, tbl32, idxs) / M * 1e9
        r["xor32"] = timed(xor, tbl32, idx0) / M * 1e9
        r["sort32"] = timed(cold, tbl32, sidx) / M * 1e9
        r["half32"] = timed(half, tbl32, idxs) / M * 1e9
        del tbl32
        if nb_bits < 26:
            tbl64 = jnp.asarray(
                rng.integers(0, 1 << 32, size=(nb, 16),
                             dtype=np.uint64).astype(np.uint32))
            r["cold64"] = timed(cold, tbl64, idxs) / M * 1e9
            del tbl64
        print(f"rows=2^{nb_bits} ({nb * 32 / 1e6:6.0f}MB@32B)  "
              + "  ".join(f"{k} {v:5.2f}ns" for k, v in r.items()),
              flush=True)


if __name__ == "__main__":
    main()
