"""Per-read scoring: hit totals, best / second-best targets.

Replaces the reference's shared-memory atomic scoreboard + warp-ballot
stream compaction (queryKernel epilogue, src/CuClarkDB.cu:1158-1242)
and the sparse-row scan of resultKernel (src/CuClarkDB.cu:1421-1471)
with a dense, branch-free reduction that maps onto the VPU:

Per read, the window labels are sorted (an independent bitonic sort per
row — ideal VPU shape), runs of equal labels are counted at their run
ends with a cummax trick, and the best target is found as (max count,
then smallest label among count-ties) in two reduction passes.  That
ordering reproduces the reference's tie-breaking exactly: resultKernel
scans targets in ascending index order with strict '>', so ties keep
the smaller target index.  No packing limits — any read length.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Final result row layout, identical to the reference's
# [sumN, indexBest, best, index_sBest, s_best] (src/CuClarkDB.cu:1460-1464).
RESULT_COLS = 5
_LBL_MAX = 65535


def score_labels(labels):
    """labels: int32 [R, P], 1-based target label per window, 0 = miss.

    Returns int32 [R, 5]: [total, index_best, best, index_2nd, second].

    Algorithm: per-row sort, then run-length counting at run ends —
    O(P log P) compare-exchanges on the VPU instead of the naive O(P^2)
    all-pairs compare, and no [R, P, P] intermediate.
    """
    R, P = labels.shape
    hit = labels > 0

    s = jnp.sort(labels, axis=-1)                           # [R, P] ascending
    idx = jax.lax.broadcasted_iota(jnp.int32, (R, P), 1)

    first = jnp.concatenate(
        [jnp.ones((R, 1), bool), s[:, 1:] != s[:, :-1]], axis=-1
    )
    last = jnp.concatenate(
        [s[:, 1:] != s[:, :-1], jnp.ones((R, 1), bool)], axis=-1
    )
    # start index of each element's run, propagated right via cummax
    run_start = jax.lax.cummax(jnp.where(first, idx, -1), axis=1)
    count = idx - run_start + 1                             # valid at run ends
    is_run = last & (s > 0)

    def top(mask):
        """(max count, smallest label among count-ties) over runs in mask."""
        c = jnp.max(jnp.where(mask, count, 0), axis=-1)
        tie = mask & (count == c[:, None])
        lab = jnp.min(jnp.where(tie, s, _LBL_MAX + 1), axis=-1)
        lab = jnp.where(c > 0, lab, 0)
        return c, lab

    best, index_best = top(is_run)
    second, index_second = top(is_run & (s != index_best[:, None]))

    total = jnp.sum(hit.astype(jnp.int32), axis=-1)
    return jnp.stack([total, index_best, best, index_second, second], axis=-1)


def gamma_confidence(total, best, second, length, k: int, paired: bool):
    """CSV math, reference src/CuCLARK_hh.hh:2054-2056, 2127-2135.

    gamma = total / (len - k + 1);  paired reads subtract NBN=1 from the
    merged length first (the joining 'N', src/CuCLARK_hh.hh:2044).
    confidence = best / (best + second), 0 when the sum is ~0.
    Computed in float64 on the host for bit-identical %g output.
    """
    import numpy as np

    norm = np.asarray(length, dtype=np.int64)
    if paired:
        norm = norm - 1  # NBN
    # reads with length <= k-1 divide by <= 0 exactly like the
    # reference's C expression (len == k-1 prints nan, shorter prints
    # -0 — parity quirks, kept); only numpy's per-batch RuntimeWarning
    # is suppressed, never the values
    with np.errstate(divide="ignore", invalid="ignore"):
        gamma = (np.asarray(total, dtype=np.float64)
                 / (norm.astype(np.float64) - k + 1.0))
    s = np.asarray(best, dtype=np.float64) + np.asarray(second, dtype=np.float64)
    conf = np.where(s < 0.001, 0.0, np.asarray(best, dtype=np.float64) / np.where(s == 0, 1.0, s))
    return norm, gamma, conf
