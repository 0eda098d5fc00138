"""Random-row gather ns/row vs TABLE SIZE for q4-shaped (32 B) rows.

bench.py r02 measured 649K reads/s on a 67 MB table but 272K on a
1 GB table; BENCHNOTES' "no table-size scaling" claim was measured on
the old s2 layout.  This isolates the gather primitive itself at
0.125/0.25/0.5/1/2/4 GB, with the amortized fori pattern + scalar
checksum (methodology per BENCHNOTES.md), plus:
  - sorted (bucket-locality) indices at each size
  - two pipelined takes (the probe's actual shape)
Run: PYTHONPATH=/root/repo python scripts/microbench_gather_size.py
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

M = 2_000_000        # rows gathered per iteration (~1 chunk's probes)
INNER = 8
OUTER = 4


def timed(fn, *args):
    fn_j = jax.jit(fn)
    _ = float(np.asarray(fn_j(*args)))  # compile + warmup
    best = float("inf")
    for _ in range(OUTER):
        t0 = time.perf_counter()
        _ = float(np.asarray(fn_j(*args)))
        best = min(best, time.perf_counter() - t0)
    return best / INNER


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)
    for gb in (0.125, 0.25, 0.5, 1.0, 2.0, 4.0):
        nb = int(gb * (1 << 30)) // 32          # 32 B rows
        nb = 1 << (nb.bit_length() - 1)         # power of two like q4
        table = jnp.asarray(
            rng.integers(0, 1 << 32, size=(nb, 8),
                         dtype=np.uint64).astype(np.uint32))
        idx = jnp.asarray(rng.integers(0, nb, size=M).astype(np.int32))
        idx2 = jnp.asarray(rng.integers(0, nb, size=M).astype(np.int32))
        mask = jnp.int32(nb - 1)

        def one(table, idx):
            def body(i, acc):
                ix = jnp.bitwise_and(jnp.bitwise_xor(idx, i), mask)
                rows = jnp.take(table, ix, axis=0)
                return acc + jnp.sum(rows[:, 0].astype(jnp.int32))
            return jax.lax.fori_loop(0, INNER, body, jnp.int32(0))

        def two(table, i1, i2):
            def body(i, acc):
                a = jnp.take(table, jnp.bitwise_and(
                    jnp.bitwise_xor(i1, i), mask), axis=0)
                b = jnp.take(table, jnp.bitwise_and(
                    jnp.bitwise_xor(i2, i), mask), axis=0)
                return acc + jnp.sum(a[:, 0].astype(jnp.int32)) \
                           + jnp.sum(b[:, 0].astype(jnp.int32))
            return jax.lax.fori_loop(0, INNER, body, jnp.int32(0))

        def one_sorted(table, idx):
            # sort indices first (bucket locality); cost of the sort is
            # INCLUDED — this is what a locality-sorting probe would pay
            def body(i, acc):
                ix = jnp.sort(jnp.bitwise_and(jnp.bitwise_xor(idx, i), mask))
                rows = jnp.take(table, ix, axis=0)
                return acc + jnp.sum(rows[:, 0].astype(jnp.int32))
            return jax.lax.fori_loop(0, INNER, body, jnp.int32(0))

        t1 = timed(one, table, idx)
        t2 = timed(two, table, idx, idx2)
        ts = timed(one_sorted, table, idx)
        print(f"table {table.nbytes / 1e9:6.2f} GB (nb=2^{nb.bit_length()-1})"
              f"  one-take {t1 / M * 1e9:6.2f} ns/row"
              f"  two-takes {t2 / (2 * M) * 1e9:6.2f} ns/row"
              f"  sorted(one) {ts / M * 1e9:6.2f} ns/row", flush=True)
        del table


if __name__ == "__main__":
    main()
