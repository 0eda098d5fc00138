"""Stash design sweep at the BASELINE ladder-3 scale (4.3 GB main).

Round 3 shipped the qs layout (one cold main gather + one warm stash
gather) and measured 424K r/s at 1.07 GB, but the ladder-3 "~4 GB DB"
config dropped to 284K: its Poisson-sized stash (2^22 rows = 134 MB)
exits the warm gather regime.  Open design questions, timing-only
(dummy table content, split-operand call pattern of the production
probe, probe-only == full step per BENCHNOTES round 3):

  floor   main-only gather at 4.3 GB (single-gather floor)
  s19-s22 + one stash gather at 16.8 / 33.6 / 67 / 134 MB — where is
          the warm/cold boundary at THIS main size?
  s2x20   + TWO stash gathers at 33.6 MB each (the 3-choice design:
          in-stash 2-choice cuckoo reaches ~95% load, halving stash
          bytes at the cost of a second warm gather)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_stash4g.py
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
MAIN_BITS = int(os.environ.get("STASH4G_MAIN_BITS", 27))  # 2^27*32B=4.29GB

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


def rand_u32(shape):
    return jnp.asarray(rng.integers(0, 1 << 32, size=shape,
                                    dtype=np.uint32))


nb = 1 << MAIN_BITS
mask = jnp.uint32(nb - 1)
main = rand_u32((nb, 8))


def main_probe(table, chi, clo):
    h1, l2 = feistel_mix(chi, clo, 0)
    rows = jnp.take(table, (l2 & mask).astype(jnp.int32), axis=0)
    meta = rows[:, 4:]
    m = ((rows[:, :4] == h1[:, None])
         & ((meta >> jnp.uint32(17))
            == (l2 >> jnp.uint32(MAIN_BITS))[:, None]))
    lab = jnp.sum(jnp.where(
        m, (meta & jnp.uint32(0xFFFF)).astype(jnp.int32), 0), axis=1)
    return lab, h1, l2


@jax.jit
def floor_fn(table, chi, clo):
    lab, _, _ = main_probe(table, chi, clo)
    return lab.sum() % 97


def stash_gather(stash, sbits, h, other, salt):
    smask = jnp.uint32((1 << sbits) - 1)
    hh = h ^ jnp.uint32(salt)
    srows = jnp.take(stash, (hh & smask).astype(jnp.int32), axis=0)
    smeta = srows[:, 4:]
    sm = ((srows[:, :4] == other[:, None])
          & ((smeta >> jnp.uint32(17))
             == (hh >> jnp.uint32(sbits))[:, None]))
    return jnp.sum(jnp.where(
        sm, (smeta & jnp.uint32(0xFFFF)).astype(jnp.int32), 0), axis=1)


def make_s(sbits):
    @jax.jit
    def f(table, stash, chi, clo):
        lab, h1, l2 = main_probe(table, chi, clo)
        lab = lab + stash_gather(stash, sbits, h1, l2, 0)
        return lab.sum() % 97
    return f


def make_s2x(sbits):
    @jax.jit
    def f(table, stash, chi, clo):
        lab, h1, l2 = main_probe(table, chi, clo)
        lab = lab + stash_gather(stash, sbits, h1, l2, 0)
        lab = lab + stash_gather(stash, sbits, h1, l2, 0x9E3779B9)
        return lab.sum() % 97
    return f


out = {}
out["floor"] = run_variant(floor_fn, [(main, c, l) for c, l in pre])
print(f"main={nb * 32 / 1e6:.0f}MB floor {out['floor'] * 1e3:6.2f}ms "
      f"({CHUNK / out['floor']:,.0f} r/s)", flush=True)
for sbits in (19, 20, 21, 22):
    stash = rand_u32((1 << sbits, 8))
    t = run_variant(make_s(sbits), [(main, stash, c, l) for c, l in pre])
    print(f"  s{sbits} ({(1 << sbits) * 32 / 1e6:5.1f}MB) {t * 1e3:6.2f}ms "
          f"({CHUNK / t:,.0f} r/s)", flush=True)
    del stash
for sbits in (19, 20):
    stash = rand_u32((1 << sbits, 8))
    t = run_variant(make_s2x(sbits), [(main, stash, c, l) for c, l in pre])
    print(f"  s2x{sbits} ({(1 << sbits) * 32 / 1e6:5.1f}MB x2 gathers) "
          f"{t * 1e3:6.2f}ms ({CHUNK / t:,.0f} r/s)", flush=True)
    del stash
