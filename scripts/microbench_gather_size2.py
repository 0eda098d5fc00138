"""Follow-up to microbench_gather_size.py: that sweep consumed only
rows[:, 0], which lets XLA narrow the gather to 4 B/row — and measured
FLAT ns/row vs table size, contradicting the 2.1x classify-step drop.
This version (a) consumes the FULL 32 B row, (b) runs the actual
_probe_q4 on precomputed mixed keys, (c) the full classify step — all
at 67 MB-class and 1 GB-class table sizes, to bisect where the
at-scale cost enters.
Run: PYTHONPATH=/root/repo python scripts/microbench_gather_size2.py
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
OUTER = 4


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
    for nb_bits in (21, 25, 26):
        nb = 1 << nb_bits
        table = jnp.asarray(
            rng.integers(0, 1 << 32, size=(nb, 8),
                         dtype=np.uint64).astype(np.uint32))
        idx = jnp.asarray(rng.integers(0, nb, size=M).astype(np.int32))
        idx2 = jnp.asarray(rng.integers(0, nb, size=M).astype(np.int32))
        mask = jnp.int32(nb - 1)

        def full_row(table, idx):
            def body(i, acc):
                ix = jnp.bitwise_and(jnp.bitwise_xor(idx, i), mask)
                rows = jnp.take(table, ix, axis=0)
                return acc + jnp.sum(rows.astype(jnp.int32))
            return jax.lax.fori_loop(0, INNER, body, jnp.int32(0))

        def full_row_two(table, i1, i2):
            def body(i, acc):
                a = jnp.take(table, jnp.bitwise_and(
                    jnp.bitwise_xor(i1, i), mask), axis=0)
                b = jnp.take(table, jnp.bitwise_and(
                    jnp.bitwise_xor(i2, i), mask), axis=0)
                return acc + jnp.sum(a.astype(jnp.int32)) \
                           + jnp.sum(b.astype(jnp.int32))
            return jax.lax.fori_loop(0, INNER, body, jnp.int32(0))

        def probe_q4_loop(table, h1, l2):
            from cuclark_tpu.probe import _probe_q4

            def body(i, acc):
                lab = _probe_q4(table, nb_bits, 0,
                                jnp.bitwise_xor(h1, i),
                                jnp.bitwise_xor(l2, i))
                return acc + jnp.sum(lab)
            return jax.lax.fori_loop(0, INNER, body, jnp.int32(0))

        h1 = jnp.asarray(rng.integers(0, 1 << 32, size=M,
                                      dtype=np.uint64).astype(np.uint32))
        l2 = jnp.asarray(rng.integers(0, 1 << 32, size=M,
                                      dtype=np.uint64).astype(np.uint32))

        t_full = timed(full_row, table, idx)
        t_two = timed(full_row_two, table, idx, idx2)
        t_probe = timed(probe_q4_loop, table, h1, l2)
        print(f"nb=2^{nb_bits} ({table.nbytes / 1e9:5.2f} GB)"
              f"  full-row {t_full / M * 1e9:6.2f} ns/row"
              f"  full-row-x2 {t_two / (2 * M) * 1e9:6.2f} ns/row"
              f"  probe_q4 {t_probe / M * 1e9:6.2f} ns/probe", flush=True)
        del table


if __name__ == "__main__":
    main()
