"""Decompose the e2e classify step cost on the real chip.

Round-1 e2e = 29 ns/valid-probe vs a measured 19.3 ns two-take floor.
Questions:
  A. How much is the repeated-index pathology from padding windows
     (all-INVALID windows hash to ONE bucket; repeated-row gathers
     measured 2.3x slower than distinct)?  -> spread-iota fix.
  B. How much is scoring (sort+RLE)?
  C. Does more take-level ILP help (4 concurrent takes vs 2)?
  D. Prototype quotient-compressed C=4 two-choice probe (32 B rows,
     64-bit reconstruct-compare) vs production probe.
Run with PYTHONPATH=/root/repo.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from cuclark_tpu import codec, score
from cuclark_tpu.config import DBConfig
from cuclark_tpu.hashdb import build_table, mix1, mix2
from cuclark_tpu.probe import probe

K = 31
N_READS = 16384
READ_LEN = 150
N_KMERS = 4_000_000
N_TARGETS = 1024
OUTER = 3


def timed(fn_j, *args):
    out = fn_j(*args)
    jax.block_until_ready(out)
    chk = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    best = float("inf")
    for _ in range(OUTER):
        t0 = time.perf_counter()
        out = fn_j(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best, chk


def main():
    rng = np.random.default_rng(0)
    km = np.unique(rng.integers(0, 1 << 62, size=int(N_KMERS * 1.05),
                                dtype=np.uint64))
    km = np.unique(codec.canonical_np(km, K))[:N_KMERS]
    labels = rng.integers(1, N_TARGETS + 1, size=len(km)).astype(np.uint32)
    names = ["NA"] + [f"T{i}" for i in range(1, N_TARGETS + 1)]
    db = build_table(km, labels, names, DBConfig(k=K, slots=2, target_load=0.7))
    table = jnp.asarray(db.table)

    genome = rng.integers(0, 4, size=2_000_000).astype(np.uint8)
    starts = rng.integers(0, len(genome) - READ_LEN, size=N_READS)
    codes = genome[starts[:, None] + np.arange(READ_LEN)[None, :]]

    out = {}
    for L in (256, 160):
        cpad = np.full((N_READS, L), codec.INVALID, np.uint8)
        cpad[:, :READ_LEN] = codes
        p2, vb = codec.pack_codes(cpad)
        p2, vb = jnp.asarray(p2), jnp.asarray(vb)
        P = L - K + 1
        nvalid = (READ_LEN - K + 1) * N_READS

        def extract(p2, vb):
            cd = codec.unpack_codes(p2, vb)
            (khi, klo), valid = codec.extract_kmers(cd, K)
            chi, clo = codec.canonical((khi, klo), K)
            return chi, clo, valid

        @jax.jit
        def probe_only(table, p2, vb):
            chi, clo, valid = extract(p2, vb)
            lab = probe(table, db.nb_bits, db.slots, db.num_choices, chi, clo)
            return jnp.sum(jnp.where(valid, lab, 0))

        @jax.jit
        def probe_spread(table, p2, vb):
            chi, clo, valid = extract(p2, vb)
            # spread invalid windows across distinct buckets: replace
            # their kmer with a lane counter so gathers don't collide
            iota = jax.lax.broadcasted_iota(jnp.uint32, chi.shape, 1) \
                 + jax.lax.broadcasted_iota(jnp.uint32, chi.shape, 0) * jnp.uint32(P)
            chi = jnp.where(valid, chi, iota)
            clo = jnp.where(valid, clo, ~iota)
            lab = probe(table, db.nb_bits, db.slots, db.num_choices, chi, clo)
            return jnp.sum(jnp.where(valid, lab, 0))

        @jax.jit
        def full_step(table, p2, vb):
            chi, clo, valid = extract(p2, vb)
            lab = probe(table, db.nb_bits, db.slots, db.num_choices, chi, clo)
            lab = jnp.where(valid, lab, 0)
            return score.score_labels(lab)

        @jax.jit
        def full_spread(table, p2, vb):
            chi, clo, valid = extract(p2, vb)
            iota = jax.lax.broadcasted_iota(jnp.uint32, chi.shape, 1) \
                 + jax.lax.broadcasted_iota(jnp.uint32, chi.shape, 0) * jnp.uint32(P)
            chi = jnp.where(valid, chi, iota)
            clo = jnp.where(valid, clo, ~iota)
            lab = probe(table, db.nb_bits, db.slots, db.num_choices, chi, clo)
            lab = jnp.where(valid, lab, 0)
            return score.score_labels(lab)

        @jax.jit
        def extract_only(p2, vb):
            chi, clo, valid = extract(p2, vb)
            return jnp.sum(jnp.where(valid, chi, 0)) + jnp.sum(clo)

        @jax.jit
        def score_only(lab):
            return score.score_labels(lab)

        lab_host = np.asarray(jax.jit(
            lambda t, a, b: jnp.where(extract(a, b)[2],
                                      probe(t, db.nb_bits, db.slots, 2,
                                            extract(a, b)[0],
                                            extract(a, b)[1]), 0)
        )(table, p2, vb))
        lab_dev = jnp.asarray(lab_host)

        r = {}
        r["extract_ms"], _ = timed(extract_only, p2, vb)
        r["probe_ms"], _ = timed(probe_only, table, p2, vb)
        r["probe_spread_ms"], _ = timed(probe_spread, table, p2, vb)
        r["score_ms"], _ = timed(score_only, lab_dev)
        r["full_ms"], _ = timed(full_step, table, p2, vb)
        r["full_spread_ms"], _ = timed(full_spread, table, p2, vb)
        r = {k: round(v * 1000, 2) for k, v in r.items()}
        r["reads_per_sec_full"] = int(N_READS / (r["full_ms"] / 1000))
        r["reads_per_sec_spread"] = int(N_READS / (r["full_spread_ms"] / 1000))
        r["ns_per_valid_probe_spread"] = round(
            r["full_spread_ms"] * 1e6 / nvalid, 2)
        out[f"L{L}"] = r
        print(json.dumps({f"L{L}": r}), flush=True)

    # C: four-take ILP
    NB = 4_000_000
    t8 = jnp.asarray(rng.integers(0, 1 << 32, size=(NB, 8), dtype=np.uint64
                                  ).astype(np.uint32))
    idx = [jnp.asarray(rng.integers(0, NB, size=250_000).astype(np.int32))
           for _ in range(4)]

    def four(t8, i0, i1, i2, i3):
        def body(i, acc):
            s = jnp.int32(0)
            for ix in (i0, i1, i2, i3):
                rows = jnp.take(t8, jnp.bitwise_xor(ix, i) % NB, axis=0)
                s = s + jnp.sum(rows[:, 0].astype(jnp.int32))
            return acc + s
        return jax.lax.fori_loop(0, 8, body, jnp.int32(0))

    dt, _ = timed(jax.jit(four), t8, *idx)
    out["four_takes_ns_per_row"] = round(dt / 8 / 1_000_000 * 1e9, 2)
    print(json.dumps({"four_takes_ns_per_row": out["four_takes_ns_per_row"]}),
          flush=True)

    # D: quotient-compressed C=4 prototype (32 B rows, reconstruct cmp)
    nb_bits = 20
    nbq = 1 << nb_bits
    tq = jnp.asarray(rng.integers(0, 1 << 32, size=(nbq, 8), dtype=np.uint64
                                  ).astype(np.uint32))
    M = 1_000_000
    khi = jnp.asarray(rng.integers(0, 1 << 32, size=M, dtype=np.uint64
                                   ).astype(np.uint32))
    klo = jnp.asarray(rng.integers(0, 1 << 32, size=M, dtype=np.uint64
                                   ).astype(np.uint32))
    mask = jnp.uint32(nbq - 1)

    def quot_probe(tq, khi, klo):
        def body(i, acc):
            hi = jnp.bitwise_xor(khi, i)
            l1 = klo ^ mix1(hi, klo)
            h1 = hi ^ mix2(l1, klo)
            b1 = (l1 & mask).astype(jnp.int32)
            b2 = (h1 & mask).astype(jnp.int32)
            lab = jnp.int32(0)
            for c, b in ((0, b1), (1, b2)):
                rows = jnp.take(tq, b, axis=0)
                other = rows[:, :4]
                meta = rows[:, 4:]
                q = meta >> jnp.uint32(17)
                cbit = (meta >> jnp.uint32(16)) & jnp.uint32(1)
                # reconstruct-compare: choice0 rows store h' as other,
                # l'>>nb as q; choice1 the converse
                m0 = (other == h1[:, None]) & (q == (l1 >> jnp.uint32(nb_bits))[:, None]) & (cbit == 0)
                m1 = (other == l1[:, None]) & (q == (h1 >> jnp.uint32(nb_bits))[:, None]) & (cbit == 1)
                m = jnp.where(jnp.bool_(c == 1) & (b1 == b2)[:, None],
                              jnp.zeros_like(m0), m0 | m1)
                lab = lab + jnp.sum(jnp.where(m, (meta & jnp.uint32(0xFFFF)
                                                  ).astype(jnp.int32), 0))
            return acc + lab
        return jax.lax.fori_loop(0, 8, body, jnp.int32(0))

    dt, _ = timed(jax.jit(quot_probe), tq, khi, klo)
    out["quot_c4_ns_per_probe"] = round(dt / 8 / M * 1e9, 2)
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
