"""Gather-layout microbench for the one-gather probe redesign.

Round-1 BENCHNOTES.md established: XLA row gather costs ~15 ns/row flat
to 32 B rows and flat in table size; two-choice probing therefore sits
at a 2-row/probe floor.  VERDICT.md asks for a one-row-per-probe
layout.  This script measures, on the real chip, everything that
decision depends on:

  1. ns/row vs row width (32/48/64/96/128 B) — what does the single
     wide row of a one-choice bucket cost?
  2. one take of 2M rows vs two takes of M rows — is call count free?
  3. repeated-index gathers — does the engine dedupe/cache rows?
     (if yes, a hot/cold second gather with most lanes parked on row 0
     would be nearly free)
  4. prototype one-gather probe (C=8, 64 B row, quotient entries) vs
     the production two-gather step at equal DB size.

Methodology per BENCHNOTES: fori_loop inside one jit with the gather
indices xor-varied by the loop counter (defeats CSE), scalar checksum
readback (defeats the remote-relay early return).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

M = 500_000          # rows gathered per iteration
NB = 4_000_000       # table rows
INNER = 8            # fori_loop reps inside one jit call
OUTER = 3            # timed calls (first extra call is warmup)


def timed(fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _ = float(np.asarray(out))  # warmup + compile
    best = float("inf")
    for _ in range(OUTER):
        t0 = time.perf_counter()
        out = fn_j(*args)
        chk = float(np.asarray(out))
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return best / INNER, chk


def bench_width(width_u32: int, rng):
    table = jnp.asarray(
        rng.integers(0, 1 << 32, size=(NB, width_u32), dtype=np.uint64
                     ).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, NB, size=M).astype(np.int32))

    def run(table, idx):
        def body(i, acc):
            ix = jnp.bitwise_xor(idx, i) % NB
            rows = jnp.take(table, ix, axis=0)
            return acc + jnp.sum(rows[:, 0].astype(jnp.int32))
        return jax.lax.fori_loop(0, INNER, body, jnp.int32(0))

    dt, _ = timed(run, table, idx)
    return dt / M * 1e9


def bench_two_takes(rng):
    """two M-row takes vs one 2M-row take, 32 B rows."""
    table = jnp.asarray(
        rng.integers(0, 1 << 32, size=(NB, 8), dtype=np.uint64
                     ).astype(np.uint32))
    i1 = jnp.asarray(rng.integers(0, NB, size=M).astype(np.int32))
    i2 = jnp.asarray(rng.integers(0, NB, size=M).astype(np.int32))

    def two(table, i1, i2):
        def body(i, acc):
            a = jnp.take(table, jnp.bitwise_xor(i1, i) % NB, axis=0)
            b = jnp.take(table, jnp.bitwise_xor(i2, i) % NB, axis=0)
            return acc + jnp.sum(a[:, 0].astype(jnp.int32)) \
                       + jnp.sum(b[:, 0].astype(jnp.int32))
        return jax.lax.fori_loop(0, INNER, body, jnp.int32(0))

    def one(table, i1, i2):
        i12 = jnp.concatenate([i1, i2])
        def body(i, acc):
            a = jnp.take(table, jnp.bitwise_xor(i12, i) % NB, axis=0)
            return acc + jnp.sum(a[:, 0].astype(jnp.int32))
        return jax.lax.fori_loop(0, INNER, body, jnp.int32(0))

    d2, _ = timed(two, table, i1, i2)
    d1, _ = timed(one, table, i1, i2)
    return d2 / M * 1e9, d1 / M * 1e9  # ns per PROBE (=2 rows)


def bench_repeated(rng, distinct_frac: float):
    """M gathers where only distinct_frac of lanes have unique rows,
    the rest all point at row 0."""
    table = jnp.asarray(
        rng.integers(0, 1 << 32, size=(NB, 8), dtype=np.uint64
                     ).astype(np.uint32))
    n_uniq = max(1, int(M * distinct_frac))
    idx_np = np.zeros(M, np.int32)
    idx_np[:n_uniq] = rng.integers(0, NB, size=n_uniq)
    idx = jnp.asarray(idx_np)

    def run(table, idx):
        def body(i, acc):
            # xor only the unique lanes' semantics don't matter; keep
            # repeated lanes repeated: mask xor to nonzero lanes
            ix = jnp.where(idx > 0, jnp.bitwise_xor(idx, i) % NB, 0)
            rows = jnp.take(table, ix, axis=0)
            return acc + jnp.sum(rows[:, 0].astype(jnp.int32))
        return jax.lax.fori_loop(0, INNER, body, jnp.int32(0))

    dt, _ = timed(run, table, idx)
    return dt / M * 1e9


def bench_probe_prototypes(rng):
    """Full probe arithmetic: current 2-gather (S=2 two-choice, 24 B
    rows) vs one-gather C=8 quotient layout (64 B row) at equal M."""
    from cuclark_tpu.hashdb import mix1, mix2

    nb_bits = 22
    nbt = 1 << nb_bits
    # two-choice table [NB, 6] (klo x2 | khi x2 | label x2)
    t2 = jnp.asarray(rng.integers(0, 1 << 32, size=(nbt, 6),
                                  dtype=np.uint64).astype(np.uint32))
    # one-gather table [NB, 16]: hi' x8 | (q16|label16) x8
    t1 = jnp.asarray(rng.integers(0, 1 << 32, size=(nbt, 16),
                                  dtype=np.uint64).astype(np.uint32))
    khi = jnp.asarray(rng.integers(0, 1 << 32, size=M, dtype=np.uint64
                                   ).astype(np.uint32))
    klo = jnp.asarray(rng.integers(0, 1 << 32, size=M, dtype=np.uint64
                                   ).astype(np.uint32))
    mask = jnp.uint32(nbt - 1)

    def two_choice(t2, khi, klo):
        def body(i, acc):
            h = jnp.bitwise_xor(khi, i)
            b1 = mix1(h, klo) & mask
            b2 = mix2(h, klo) & mask
            lab = jnp.int32(0)
            for b in (b1, b2):
                rows = jnp.take(t2, b.astype(jnp.int32), axis=0)
                m = (rows[:, :2] == klo[:, None]) & (rows[:, 2:4] == h[:, None])
                lab = lab + jnp.sum(jnp.where(m, rows[:, 4:].astype(jnp.int32), 0))
            return acc + lab
        return jax.lax.fori_loop(0, INNER, body, jnp.int32(0))

    def one_gather(t1, khi, klo):
        def body(i, acc):
            h = jnp.bitwise_xor(khi, i)
            # Feistel-ish mix for bucket + quotient
            l1 = klo ^ mix1(h, klo)
            h1 = h ^ mix2(l1, klo)
            b = (l1 & mask).astype(jnp.int32)
            q16 = (l1 >> jnp.uint32(16)).astype(jnp.uint32) & jnp.uint32(0xFFFF)
            rows = jnp.take(t1, b, axis=0)
            mh = rows[:, :8] == h1[:, None]
            mq = (rows[:, 8:] >> jnp.uint32(16)) == q16[:, None]
            m = mh & mq
            lab = jnp.sum(jnp.where(m, (rows[:, 8:] & jnp.uint32(0xFFFF)
                                        ).astype(jnp.int32), 0))
            return acc + lab
        return jax.lax.fori_loop(0, INNER, body, jnp.int32(0))

    d2, _ = timed(two_choice, t2, khi, klo)
    d1, _ = timed(one_gather, t1, khi, klo)
    return d2 / M * 1e9, d1 / M * 1e9


def main():
    rng = np.random.default_rng(7)
    out = {"device": str(jax.devices()[0])}

    widths = {}
    for w in (8, 12, 16, 24, 32):
        widths[f"{w*4}B"] = round(bench_width(w, rng), 2)
        print(json.dumps({"width_ns_per_row": widths}), flush=True)
    out["width_ns_per_row"] = widths

    two, one = bench_two_takes(rng)
    out["two_takes_ns_per_probe"] = round(two, 2)
    out["one_take2M_ns_per_probe"] = round(one, 2)
    print(json.dumps(out), flush=True)

    rep = {}
    for f in (1.0, 0.25, 0.03, 0.0):
        rep[f"distinct_{f}"] = round(bench_repeated(rng, f), 2)
        print(json.dumps({"repeated_ns_per_row": rep}), flush=True)
    out["repeated_ns_per_row"] = rep

    d2, d1 = bench_probe_prototypes(rng)
    out["probe2_ns"] = round(d2, 2)
    out["probe1_ns"] = round(d1, 2)
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
