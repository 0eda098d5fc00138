"""Scoring cost experiments: the per-read sort is co-dominant with the
probe after the q4 layout.  Variants:
  a. current: int32 per-row sort (score.score_labels)
  b. u16 sort: labels <= 65535, half the sort bytes
  c. sort+score fused step vs probe-only (what scoring adds in situ)
Run from /root/repo with .axon_site on PYTHONPATH."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from cuclark_tpu import score

R, P = 16384, 130
rng = np.random.default_rng(0)
lab_np = np.zeros((R, P), np.int32)
m = rng.random((R, P)) < 0.6
lab_np[m] = rng.integers(1, 1025, size=m.sum())
lab = jnp.asarray(lab_np)


def timed(fn, *a):
    f = jax.jit(fn)
    out = f(*a)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def score_i32(lab):
    return score.score_labels(lab)


def score_u16(lab):
    return score.score_labels(lab.astype(jnp.uint16).astype(jnp.int32))


def sort_only_i32(lab):
    return jnp.sort(lab, axis=-1)[:, :1]


def sort_only_u16(lab):
    return jnp.sort(lab.astype(jnp.uint16), axis=-1)[:, :1]


def sort_flat_u32(lab):
    # one global sort of (row<<17 | label) instead of a per-row sort
    rid = jax.lax.broadcasted_iota(jnp.uint32, lab.shape, 0)
    key = (rid << jnp.uint32(17)) | lab.astype(jnp.uint32)
    return jnp.sort(key.ravel())[:1]


for name, fn in (("score_i32", score_i32), ("score_u16", score_u16),
                 ("sort_i32", sort_only_i32), ("sort_u16", sort_only_u16),
                 ("sort_flat_u32", sort_flat_u32)):
    ms = timed(fn, lab)
    print(f"{name}: {ms:.2f} ms  ({ms*1e6/(R*P):.2f} ns/window)",
          flush=True)
