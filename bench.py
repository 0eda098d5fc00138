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
import sys
import time

import numpy as np

BASELINE_READS_PER_SEC = 16667.0


def _log(msg):
    print(f"[bench +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr,
          flush=True)


_T0 = time.time()


def main():
    import jax
    import jax.numpy as jnp

    try:  # persistent XLA cache: repeat runs skip the jit compiles
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "cuclark_tpu", "xla")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

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
    _log('building main table')
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

    _log('warmup compile (device step)')
    run()  # warmup/compile

    _log('timing device step')
    times = []
    for _ in range(reps):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    dt = min(times)
    rps = n_reads / dt

    detail = {
        "device": str(jax.devices()[0]).split(":")[0],
        "n_reads": n_reads,
        "read_len": read_len,
        "db_kmers": int(db.num_kmers),
        "n_targets": n_targets,
        "layout": db.layout,
        "table_mb": round(db.table.nbytes / 1e6, 1),
        "db_build_s": round(build_s, 2),
        "step_ms": round(dt * 1e3, 2),
        "kmer_probes_per_sec": round(rps * (read_len - k + 1), 0),
    }

    # --- end-to-end file -> CSV (host scan/pack/format included) ---
    # the reference's own metric is objects/min through the whole
    # binary (src/CuCLARK_hh.hh:1940-1943); this measures our analog.
    e2e_reads = int(os.environ.get("CUCLARK_BENCH_E2E_READS", 500_000))
    if e2e_reads:
        import tempfile
        from pathlib import Path

        from cuclark_tpu.config import ClassifyConfig
        from cuclark_tpu.pipeline import Classifier

        base = "ACGT"
        starts_e = rng.integers(0, len(genome) - read_len, size=e2e_reads)
        rows = genome[starts_e[:, None] + np.arange(read_len)[None, :]]
        seq_bytes = np.frombuffer(base.encode(), np.uint8)[rows]
        with tempfile.TemporaryDirectory() as td:
            fq = Path(td) / "bench.fq"
            qual = b"I" * read_len
            with open(fq, "wb") as f:
                blocks = []
                for i in range(e2e_reads):
                    blocks.append(b"@r%d\n%s\n+\n%s\n"
                                  % (i, seq_bytes[i].tobytes(), qual))
                    if len(blocks) == 65536:
                        f.write(b"".join(blocks))
                        blocks = []
                f.write(b"".join(blocks))
            clf = Classifier(db, ClassifyConfig(batch_reads=chunk))
            out_csv = Path(td) / "out.csv"
            _log('e2e warmup')
            clf.classify_file_to_csv(fq, out_csv)  # warmup (compile)
            t0 = time.time()
            n = clf.classify_file_to_csv(fq, out_csv)
            e2e_dt = time.time() - t0
            assert n == e2e_reads
        detail["e2e_reads_per_sec"] = round(e2e_reads / e2e_dt, 1)
        detail["e2e_objects_per_min"] = int(e2e_reads / e2e_dt * 60)

    # --- at-scale device step: multi-GB-class table, >=10K targets ---
    # (BASELINE ladder 3; gathers measured flat in table size, this
    # documents it at representative scale)
    scale_kmers = int(os.environ.get("CUCLARK_BENCH_SCALE_KMERS", 64_000_000))
    if scale_kmers:
        _log('building at-scale table')
        kms = rng.integers(0, 1 << 62, size=int(scale_kmers * 1.02),
                           dtype=np.uint64)
        kms = np.unique(codec.canonical_np(kms, k))[:scale_kmers]
        labs = rng.integers(1, 16385, size=len(kms)).astype(np.uint32)
        nm = ["NA"] + [f"T{i}" for i in range(1, 16385)]
        t0 = time.time()
        db_s = build_table(kms, labs, nm, DBConfig(k=k, target_load=0.85))
        scale_build = time.time() - t0
        tbl_s = jnp.asarray(db_s.table)
        dev_s = dev_chunks[:4]

        def run_scale():
            acc = jnp.int32(0)
            for p2, vb in dev_s:
                results, _ = classify_step_packed(
                    tbl_s, p2, vb, k=db_s.k, nb_bits=db_s.nb_bits,
                    slots=db_s.slots, num_choices=db_s.num_choices,
                    layout=db_s.layout, seed=db_s.seed, with_labels=False)
                acc = acc + results[:, 0].sum() % 97
            return float(np.asarray(acc))

        _log('at-scale warmup done' if False else 'at-scale timing')
        run_scale()
        t0 = time.time()
        run_scale()
        sdt = time.time() - t0
        detail["scale"] = {
            "db_kmers": int(db_s.num_kmers),
            "n_targets": 16384,
            "table_mb": round(db_s.table.nbytes / 1e6, 1),
            "db_build_s": round(scale_build, 1),
            "reads_per_sec": round(4 * chunk / sdt, 1),
        }

    out = {
        "metric": "reads_per_sec",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 3),
        "detail": detail,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
