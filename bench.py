"""Benchmark: classified reads/sec on one chip.

Builds a synthetic bacteria-scale-shaped database (k=31, configurable
k-mer count) plus a batch of 150 bp reads, runs the jitted classify
step end-to-end on the default JAX device, and prints ONE JSON line:

  {"metric": "reads_per_sec", "value": N, "unit": "reads/s",
   "vs_baseline": R}

vs_baseline: the reference emits objects/min (src/CuCLARK_hh.hh:
1940-1943) but publishes no numbers in-tree (BASELINE.json.published is
empty).  We anchor on the CuCLARK paper's headline setup — ~1M reads
classified per minute per 6 GB GTX-class GPU against the bacteria DB —
i.e. BASELINE_READS_PER_SEC = 16667 reads/s/device.  vs_baseline is
our reads/s divided by that.

Env knobs: CUCLARK_BENCH_READS, CUCLARK_BENCH_KMERS,
CUCLARK_BENCH_READLEN, CUCLARK_BENCH_TARGETS, CUCLARK_BENCH_REPS.
"""

import json
import os
import time

import numpy as np

BASELINE_READS_PER_SEC = 16667.0


def main():
    import jax
    import jax.numpy as jnp

    from cuclark_tpu import codec
    from cuclark_tpu.config import DBConfig
    from cuclark_tpu.hashdb import build_table
    from cuclark_tpu.pipeline import classify_step_packed

    n_reads = int(os.environ.get("CUCLARK_BENCH_READS", 131072))
    n_kmers = int(os.environ.get("CUCLARK_BENCH_KMERS", 4_000_000))
    read_len = int(os.environ.get("CUCLARK_BENCH_READLEN", 150))
    n_targets = int(os.environ.get("CUCLARK_BENCH_TARGETS", 1024))
    reps = int(os.environ.get("CUCLARK_BENCH_REPS", 3))
    chunk = int(os.environ.get("CUCLARK_BENCH_CHUNK", 16384))
    k = 31
    n_reads = (n_reads // chunk) * chunk or chunk

    rng = np.random.default_rng(0)

    # --- synthetic target-specific DB ---
    km = np.unique(rng.integers(0, 1 << 62, size=int(n_kmers * 1.05),
                                dtype=np.uint64))
    km = codec.canonical_np(km, k)
    km = np.unique(km)[:n_kmers]
    labels = rng.integers(1, n_targets + 1, size=len(km)).astype(np.uint32)
    names = ["NA"] + [f"T{i}" for i in range(1, n_targets + 1)]
    cfg = DBConfig(k=k, slots=2, target_load=0.7)
    t0 = time.time()
    db = build_table(km, labels, names, cfg)
    build_s = time.time() - t0

    # --- synthetic reads: substrings of synthetic genomes with hits ---
    genome = rng.integers(0, 4, size=2_000_000).astype(np.uint8)
    starts = rng.integers(0, len(genome) - read_len, size=n_reads)
    codes = genome[starts[:, None] + np.arange(read_len)[None, :]]

    table = jnp.asarray(db.table)
    # the production wire format: 2-bit packed codes + validity bitmask
    dev_chunks = [tuple(jnp.asarray(a)
                        for a in codec.pack_codes(codes[i: i + chunk]))
                  for i in range(0, n_reads, chunk)]

    def run():
        # scalar checksum forces real execution of every chunk; a bare
        # block_until_ready can return early through the remote relay
        acc = jnp.int32(0)
        for p2, vb in dev_chunks:
            results, _ = classify_step_packed(
                table, p2, vb, k=db.k, nb_bits=db.nb_bits,
                slots=db.slots, num_choices=db.num_choices,
                layout=db.layout, seed=db.seed,
                with_labels=False,
            )
            acc = acc + results[:, 0].sum() % 97
        return float(np.asarray(acc))

    run()  # warmup/compile

    times = []
    for _ in range(reps):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    dt = min(times)
    rps = n_reads / dt

    out = {
        "metric": "reads_per_sec",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 3),
        "detail": {
            "device": str(jax.devices()[0]).split(":")[0],
            "n_reads": n_reads,
            "read_len": read_len,
            "db_kmers": int(db.num_kmers),
            "n_targets": n_targets,
            "table_mb": round(db.table.nbytes / 1e6, 1),
            "db_build_s": round(build_s, 2),
            "step_ms": round(dt * 1e3, 2),
            "kmer_probes_per_sec": round(rps * (read_len - k + 1), 0),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
